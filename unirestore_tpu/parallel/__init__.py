from .distributed import init_distributed, process_local_rows  # noqa: F401
from .fsdp import fsdp_shard, fsdp_spec, sharded_fraction  # noqa: F401
from .mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
    spatial_batch_sharding,
    unreplicate,
)
