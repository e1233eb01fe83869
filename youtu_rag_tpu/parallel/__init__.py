from .mesh import get_mesh, local_device_count
from .sharded_index import ShardedVectorIndex, make_sharded_topk

__all__ = ["ShardedVectorIndex", "get_mesh", "local_device_count", "make_sharded_topk"]
