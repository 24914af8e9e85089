from uda_clr_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest,
)
