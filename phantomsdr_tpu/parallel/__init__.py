from .sharded import ShardedHopPipeline, make_mesh  # noqa: F401
