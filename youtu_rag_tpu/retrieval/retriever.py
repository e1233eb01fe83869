"""Retrievers: embed → fused device search → threshold → rerank.

Semantics parity with ``utu/rag/knowledge_retrieval/base_retriever.py:14-155``:
- recall 2× top_k when reranking is enabled, then cut to top_k;
- similarity_threshold <= 0 disables filtering;
- ranks are 1-based on the final ordering.
TPU upgrade: ``batch_retrieve`` embeds all queries in one batch and runs one
fused kernel launch (the reference loops ``retrieve`` sequentially,
base_retriever.py:82-99)."""

from __future__ import annotations

import time
from typing import Any

import numpy as np

from ..core.config import RetrieverConfig
from ..core.types import BaseEmbedder, BaseReranker, BaseRetriever, RetrievalResult
from ..utils.log import get_logger
from .store import TpuVectorStore

logger = get_logger("retrieval.retriever")


class VectorRetriever(BaseRetriever):
    def __init__(
        self,
        vector_store: TpuVectorStore,
        embedder: BaseEmbedder,
        config: RetrieverConfig | None = None,
        reranker: BaseReranker | None = None,
    ):
        self.store = vector_store
        self.embedder = embedder
        self.config = config or RetrieverConfig()
        self.reranker = reranker

    async def retrieve(
        self,
        query: str,
        top_k: int | None = None,
        filters: dict[str, Any] | None = None,
        enable_reranking: bool | None = None,
        similarity_threshold: float | None = None,
        **kwargs,
    ) -> list[RetrievalResult]:
        return (
            await self.batch_retrieve(
                [query],
                top_k=top_k,
                filters=filters,
                enable_reranking=enable_reranking,
                similarity_threshold=similarity_threshold,
            )
        )[0]

    async def batch_retrieve(
        self,
        queries: list[str],
        top_k: int | None = None,
        filters: dict[str, Any] | None = None,
        enable_reranking: bool | None = None,
        similarity_threshold: float | None = None,
        **kwargs,
    ) -> list[list[RetrievalResult]]:
        t0 = time.perf_counter()
        top_k = top_k or self.config.top_k
        rerank = (
            enable_reranking
            if enable_reranking is not None
            else (self.config.enable_reranking and self.reranker is not None)
        )
        threshold = (
            similarity_threshold
            if similarity_threshold is not None
            else self.config.similarity_threshold
        )
        metric = getattr(self.store.config, "distance_metric", "cosine")
        if threshold > 0 and metric not in ("cosine",):
            # l2 scores are 2q·x − ||x||² and ip is unbounded — a [0,1]
            # similarity threshold would drop results arbitrarily
            logger.warning(
                "similarity_threshold ignored for metric %r (scores are not similarities)",
                metric,
            )
            threshold = 0.0
        fetch_k = top_k * 2 if rerank else top_k

        from ..tracing.tracer import get_tracer

        tracer = get_tracer()
        with tracer.span("embedding", "embed_queries", n=len(queries)):
            embs = np.asarray(await self.embedder.embed_texts(queries), np.float32)
        with tracer.span(
            "retrieval", "vector_search", n=len(queries), top_k=fetch_k,
            filtered=bool(filters),
        ) as search_span:
            hit_lists = await self.store.search_batch(embs, top_k=fetch_k, filters=filters)
            search_span.attributes["hits"] = sum(len(h) for h in hit_lists)

        out: list[list[RetrievalResult]] = []
        for qi, hits in enumerate(hit_lists):
            results = [
                RetrievalResult(chunk=c, score=s, rank=i + 1)
                for i, (c, s) in enumerate(hits)
                if threshold <= 0 or s >= threshold
            ]
            if rerank and results and self.reranker is not None:
                results = await self.reranker.rerank(queries[qi], results, top_k=top_k)
            else:
                results = results[:top_k]
                for i, r in enumerate(results):
                    r.rank = i + 1
            out.append(results)
        logger.debug(
            "retrieved %d queries in %.1f ms", len(queries), (time.perf_counter() - t0) * 1e3
        )
        return out


class HybridRetriever(VectorRetriever):
    """Dense + lexical fusion via reciprocal rank fusion.

    The reference's HybridRetriever is an unimplemented stub that delegates
    to dense (base_retriever.py:102-139, 'TODO BM25 fusion'); here the
    fusion is real: dense candidates from the device index, lexical scores
    from BM25 over the candidate pool, merged with RRF."""

    def __init__(self, *args, rrf_k: int = 60, fusion_pool: int = 50, **kwargs):
        super().__init__(*args, **kwargs)
        from ..models.reranker import LexicalReranker

        self.rrf_k = rrf_k
        self.fusion_pool = fusion_pool
        self._lexical = LexicalReranker()

    async def batch_retrieve(
        self,
        queries,
        top_k=None,
        filters=None,
        enable_reranking=None,
        similarity_threshold=None,
        **kwargs,
    ):
        top_k = top_k or self.config.top_k
        rerank = (
            enable_reranking
            if enable_reranking is not None
            else (self.config.enable_reranking and self.reranker is not None)
        )
        threshold = (
            similarity_threshold
            if similarity_threshold is not None
            else self.config.similarity_threshold
        )
        pool = max(self.fusion_pool, top_k)
        # threshold applies on the DENSE similarity before fusion — RRF
        # values are rank artifacts (~1/rrf_k), not similarities
        dense_lists = await super().batch_retrieve(
            queries, top_k=pool, filters=filters, enable_reranking=False,
            similarity_threshold=threshold,
        )
        out = []
        for query, dense in zip(queries, dense_lists):
            if not dense:
                out.append([])
                continue
            lex_scores = self._lexical.score(query, [r.chunk.content for r in dense])
            lex_order = sorted(range(len(dense)), key=lambda i: -lex_scores[i])
            rrf: dict[int, float] = {}
            for rank, i in enumerate(lex_order):
                rrf[i] = rrf.get(i, 0.0) + 1.0 / (self.rrf_k + rank + 1)
            for i in range(len(dense)):  # the dense list IS its ranking
                rrf[i] = rrf.get(i, 0.0) + 1.0 / (self.rrf_k + i + 1)
            order = sorted(rrf, key=lambda i: -rrf[i])[:top_k]
            # RRF orders; the reported score stays the dense similarity so
            # downstream confidence cutoffs keep a [0,1]-ish scale
            results = [
                RetrievalResult(chunk=dense[i].chunk, score=dense[i].score, rank=rank + 1)
                for rank, i in enumerate(order)
            ]
            if rerank and results and self.reranker is not None:
                results = await self.reranker.rerank(query, results, top_k=top_k)
            out.append(results)
        return out
