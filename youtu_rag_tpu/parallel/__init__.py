from .mesh import get_hybrid_mesh, get_mesh, init_distributed, local_device_count
from .sharded_index import ShardedVectorIndex, make_sharded_topk

__all__ = [
    "ShardedVectorIndex",
    "get_hybrid_mesh",
    "get_mesh",
    "init_distributed",
    "local_device_count",
    "make_sharded_topk",
]

# encoder parallelism variants import lazily (they pull in the model
# stack); from youtu_rag_tpu.parallel.sequence_parallel import ... etc.
