from .topk import fused_topk, xla_topk, pallas_topk, NEG_INF
from .kmeans import kmeans_fit, kmeans_assign

__all__ = ["fused_topk", "xla_topk", "pallas_topk", "kmeans_fit", "kmeans_assign", "NEG_INF"]
