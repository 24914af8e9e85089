from uda_clr_tpu.models.norm import DomainNorm2d
from uda_clr_tpu.models.deeplab import DeepLab
from uda_clr_tpu.models.gan import (
    BoundaryDiscriminator,
    BoundaryEntDiscriminator,
    MLPDiscriminator,
    OutputDiscriminator,
    UncertaintyDiscriminator,
)
