"""BaseVectorStore facade over the TPU device index.

This is the seam where the reference swaps Chroma/FAISS
(``utu/rag/storage/implementations/*``; factory ``storage/__init__.py``)
and the TPU build swaps the device engine: everything above — retrievers,
toolkits, builders, memory — only sees ``BaseVectorStore``.

Batching note: ``search`` takes one embedding (reference signature); the
engine-native ``search_batch`` amortizes a whole query batch through one
fused kernel launch (replaces the reference's sequential
``batch_retrieve`` loop, ``base_retriever.py:82-99``)."""

from __future__ import annotations

import asyncio
import time
from typing import Any

import numpy as np

from ..core.config import VectorStoreConfig
from ..core.types import BaseVectorStore, Chunk, HealthStatus
from ..index.device_index import DeviceVectorIndex
from ..index.numpy_ref import NumpyVectorIndex
from ..utils.log import get_logger

logger = get_logger("retrieval.store")


class TpuVectorStore(BaseVectorStore):
    """Vector store backed by a device (or numpy) index.

    The index dimension is fixed lazily on the first ``add_chunks`` call
    (from the embedding length), like Chroma collections materializing on
    first insert."""

    def __init__(
        self,
        config: VectorStoreConfig | None = None,
        dim: int | None = None,
        mesh=None,
    ):
        self.config = config or VectorStoreConfig()
        self._dim = dim
        self._mesh = mesh
        self._index: DeviceVectorIndex | NumpyVectorIndex | None = None
        self._lock = asyncio.Lock()
        if dim is not None:
            self._index = self._make_index(dim)

    # -- engine plumbing ---------------------------------------------------

    def _make_index(self, dim: int):
        icfg = self.config.index
        metric = {"cosine": "cosine", "euclidean": "l2", "dot": "ip"}[self.config.distance_metric]
        icfg = icfg.model_copy(update={"metric": metric})
        if self.config.backend == "numpy":
            return NumpyVectorIndex(dim, icfg)
        if self._mesh is not None:
            from ..parallel.sharded_index import ShardedVectorIndex

            return ShardedVectorIndex(dim, icfg, mesh=self._mesh)
        return DeviceVectorIndex(dim, icfg)

    @property
    def index(self):
        if self._index is None:
            raise RuntimeError("store is empty; dimension unknown until first add_chunks")
        return self._index

    def _ensure_index(self, dim: int):
        if self._index is None:
            self._dim = dim
            self._index = self._make_index(dim)
        elif dim != self._dim:
            raise ValueError(f"embedding dim {dim} != store dim {self._dim}")
        return self._index

    # -- BaseVectorStore ---------------------------------------------------

    async def add_chunks(self, chunks: list[Chunk]) -> None:
        if not chunks:
            return
        missing = [c.id for c in chunks if c.embedding is None]
        if missing:
            raise ValueError(f"chunks missing embeddings: {missing[:3]}...")
        embs = np.asarray([c.embedding for c in chunks], np.float32)
        async with self._lock:
            self._ensure_index(embs.shape[1]).add(chunks, embs)

    async def search(
        self,
        query_embedding: list[float],
        top_k: int = 5,
        filters: dict[str, Any] | None = None,
    ) -> list[tuple[Chunk, float]]:
        return (await self.search_batch([query_embedding], top_k, filters))[0]

    async def search_batch(
        self,
        query_embeddings: list[list[float]] | np.ndarray,
        top_k: int = 5,
        filters: dict[str, Any] | None = None,
    ) -> list[list[tuple[Chunk, float]]]:
        """Engine-native batched search: one fused kernel launch for the
        whole query batch."""
        q = np.asarray(query_embeddings, np.float32)
        n_q = q.shape[0] if q.ndim >= 1 else 0
        if n_q == 0:
            return []  # empty batch: (0,)-shaped array would fail dim checks
        if self._index is None or self._index.count() == 0:
            return [[] for _ in range(n_q)]
        return self._index.search(q, top_k=top_k, filters=filters)

    async def reserve(self, total_rows: int, dim: int | None = None) -> None:
        """Pre-allocate index capacity for a planned build."""
        if self._index is None:
            if dim is None:
                return  # dimension unknown until first add
            self._ensure_index(dim)
        if hasattr(self._index, "reserve"):
            self._index.reserve(total_rows)

    async def delete(self, chunk_ids: list[str]) -> None:
        if self._index is not None:
            self._index.delete(chunk_ids)

    async def update_metadata(self, chunk_ids: list[str], metadatas: list[dict]) -> int:
        """Metadata-only update (no re-embedding); see DeviceVectorIndex."""
        if self._index is None or not hasattr(self._index, "update_metadata"):
            return 0  # numpy test backend: no in-place metadata surface
        return self._index.update_metadata(chunk_ids, metadatas)

    async def delete_by_document_id(self, document_id: str) -> int:
        if self._index is None:
            return 0
        return self._index.delete_by_document_id(document_id)

    async def get_by_id(self, chunk_id: str) -> Chunk | None:
        if self._index is None:
            return None
        return self._index.get_by_id(chunk_id)

    async def count(self) -> int:
        return 0 if self._index is None else self._index.count()

    async def count_by_document(self, document_id: str) -> int:
        return 0 if self._index is None else self._index.count_by_document(document_id)

    async def clear(self) -> None:
        if self._index is not None:
            self._index.clear()

    # -- extras used by toolkits/monitoring --------------------------------

    async def get_by_filter(
        self,
        filters: dict[str, Any],
        limit: int | None = 1000,
        offset: int = 0,
        text: str | None = None,
    ) -> list[Chunk]:
        """Host-side metadata scan (ref analog: chroma collection.get with
        where-clauses). Used for summary-index listing and memory fetches.

        Pagination pushdown: ``offset``/``text`` evaluate in the streaming
        pass, so a page view materializes at most ``limit`` chunks and the
        scan stops as soon as the page fills (a 10M-chunk KB no longer
        pulls every match to serve one SPA page). ``limit=None`` keeps the
        scan-everything behavior."""
        chunks, _ = await self.scan_page(
            filters, limit=limit, offset=offset, text=text, with_count=False
        )
        return chunks

    async def scan_page(
        self,
        filters: dict[str, Any] | None,
        limit: int | None = 50,
        offset: int = 0,
        text: str | None = None,
        with_count: bool = True,
    ) -> tuple[list[Chunk], int]:
        """One streaming pass → (page, matched). With ``with_count`` the
        scan continues past the page to report the exact match count (the
        SPA pagination header); without it the iteration stops the moment
        the page fills — O(limit) materialization either way."""
        from ..index.filters import host_eval

        if self._index is None:
            return [], 0
        text_l = text.lower() if text else None
        out: list[Chunk] = []
        matched = 0
        for c in self._index.iter_live():
            if filters and not host_eval(filters, c.metadata):
                continue
            if text_l is not None and text_l not in c.content.lower():
                continue
            if matched >= offset and (limit is None or len(out) < limit):
                out.append(c)
            matched += 1
            if (
                not with_count
                and limit is not None
                and len(out) >= limit
            ):
                break
        return out, matched

    async def health(self) -> HealthStatus:
        n = await self.count()
        nbytes = self._index.nbytes() if isinstance(self._index, DeviceVectorIndex) else 0
        return HealthStatus(
            is_healthy=True,
            backend=self.config.backend,
            collection_name=self.config.collection_name,
            total_chunks=n,
            index_size_bytes=nbytes,
            last_check_time=time.strftime("%Y-%m-%dT%H:%M:%S"),
        )


class VectorStoreFactory:
    """Backend dispatch (ref: utu/rag/storage/__init__.py)."""

    @staticmethod
    def create(config: VectorStoreConfig | None = None, dim: int | None = None, mesh=None) -> TpuVectorStore:
        return TpuVectorStore(config, dim=dim, mesh=mesh)
