from .sharded import (  # noqa: F401
    ShardedHopPipeline, make_mesh, unpack_outputs_sharded,
)
