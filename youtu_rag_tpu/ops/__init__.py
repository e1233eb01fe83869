from .topk import fused_topk, xla_topk, pallas_topk, pallas_topk_pruned, NEG_INF
from .kmeans import kmeans_fit, kmeans_assign

__all__ = ["fused_topk", "xla_topk", "pallas_topk", "pallas_topk_pruned", "kmeans_fit", "kmeans_assign", "NEG_INF"]
