from .store import TpuVectorStore, VectorStoreFactory
from .retriever import VectorRetriever, HybridRetriever
from .context import ContextAssembler

__all__ = [
    "ContextAssembler",
    "HybridRetriever",
    "TpuVectorStore",
    "VectorRetriever",
    "VectorStoreFactory",
]
