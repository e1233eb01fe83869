from .store import MemoryVectorStore, MemoryNode
from .toolkit import VectorMemoryToolkit

__all__ = ["MemoryNode", "MemoryVectorStore", "VectorMemoryToolkit"]
