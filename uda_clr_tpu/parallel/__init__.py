from uda_clr_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    replicated_sharding,
    shard_batch,
)
from uda_clr_tpu.parallel.distributed import (
    maybe_initialize,
    put_global,
    put_global_batch,
)
