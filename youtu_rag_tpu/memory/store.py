"""Memory vector store on the TPU retrieval engine.

Capability parity with ``utu/rag/storage/implementations/memory_store.py``
(``MemoryVectorStore.search_memories/get_working_memory``, :163-643) with a
TPU-native twist: the reference keeps one Chroma collection per
(user, memory_type); here all memories share ONE device index and
user/type/session partitions are metadata columns — partition filtering is
the same fused mask-and-score as any other filter, so cross-type retrieval
(retrieve_all_context) is one batched kernel launch instead of N collection
queries.

Memory types (ref memory_toolkit.py:316-446): working (session-scoped
turn log), episodic (past conversations), semantic (distilled facts),
procedural (skills with success stats)."""

from __future__ import annotations

import math
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from ..core.config import IndexConfig, VectorStoreConfig
from ..core.types import BaseEmbedder, Chunk
from ..retrieval.store import TpuVectorStore
from ..utils.log import get_logger

logger = get_logger("memory.store")

MEMORY_TYPES = ("working", "episodic", "semantic", "procedural")


@dataclass
class MemoryNode:
    id: str
    user_id: str
    memory_type: str  # working | episodic | semantic | procedural
    content: str
    importance: float = 0.5
    created_at: float = field(default_factory=time.time)
    session_id: str = ""
    success_count: int = 0
    use_count: int = 0
    metadata: dict[str, Any] = field(default_factory=dict)

    @property
    def success_rate(self) -> float:
        return self.success_count / self.use_count if self.use_count else 0.0

    @staticmethod
    def new(user_id: str, memory_type: str, content: str, **kwargs) -> "MemoryNode":
        assert memory_type in MEMORY_TYPES, memory_type
        return MemoryNode(
            id=f"mem-{uuid.uuid4().hex[:16]}",
            user_id=user_id,
            memory_type=memory_type,
            content=content,
            **kwargs,
        )


class MemoryVectorStore:
    """Single-index memory store with metadata-partitioned memory types."""

    def __init__(self, embedder: BaseEmbedder, config: VectorStoreConfig | None = None):
        self.embedder = embedder
        cfg = config or VectorStoreConfig(
            collection_name="memory",
            index=IndexConfig(min_capacity=4096, block_rows=1024, max_metadata_columns=8),
        )
        self.store = TpuVectorStore(cfg)
        self._nodes: dict[str, MemoryNode] = {}

    # -- writes ------------------------------------------------------------

    async def add(self, node: MemoryNode) -> str:
        emb = await self.embedder.embed_query(node.content)
        chunk = Chunk(
            id=node.id,
            document_id=f"{node.user_id}/{node.memory_type}",
            content=node.content,
            chunk_index=0,
            metadata={
                "user_id": node.user_id,
                "memory_type": node.memory_type,
                "session_id": node.session_id,
                "importance": node.importance,
                "created_at": int(node.created_at),
            },
            embedding=emb,
        )
        await self.store.add_chunks([chunk])
        self._nodes[node.id] = node
        return node.id

    async def delete(self, memory_ids: list[str]) -> int:
        await self.store.delete(memory_ids)
        n = 0
        for mid in memory_ids:
            if self._nodes.pop(mid, None) is not None:
                n += 1
        return n

    def get(self, memory_id: str) -> MemoryNode | None:
        return self._nodes.get(memory_id)

    async def clear_user(self, user_id: str) -> int:
        ids = [m.id for m in self._nodes.values() if m.user_id == user_id]
        return await self.delete(ids)

    # -- reads -------------------------------------------------------------

    async def search_memories(
        self,
        user_id: str,
        query: str,
        memory_types: list[str] | None = None,
        top_k: int = 5,
        min_importance: float = 0.0,
        min_success_rate: float | None = None,
        recency_half_life_s: float = 7 * 86400.0,
        importance_weight: float = 0.2,
        recency_weight: float = 0.2,
    ) -> list[tuple[MemoryNode, float]]:
        """Similarity + importance + recency scoring
        (ref: memory_toolkit.py:840-932). One fused filtered search."""
        filters: dict[str, Any] = {"user_id": user_id}
        types = memory_types or ["episodic", "semantic", "procedural"]
        filters["memory_type"] = {"$in": list(types)}
        if min_importance > 0:
            filters["importance"] = {"$gte": min_importance}

        emb = await self.embedder.embed_query(query)
        hits = await self.store.search(emb, top_k=top_k * 3, filters=filters)

        now = time.time()
        scored: list[tuple[MemoryNode, float]] = []
        for chunk, sim in hits:
            node = self._nodes.get(chunk.id)
            if node is None:
                continue
            if min_success_rate is not None and node.memory_type == "procedural":
                if node.use_count and node.success_rate < min_success_rate:
                    continue
            age = max(now - node.created_at, 0.0)
            recency = math.exp(-age * math.log(2) / recency_half_life_s)
            score = (
                (1 - importance_weight - recency_weight) * sim
                + importance_weight * node.importance
                + recency_weight * recency
            )
            scored.append((node, score))
        scored.sort(key=lambda x: -x[1])
        return scored[:top_k]

    async def get_working_memory(
        self, user_id: str, session_id: str, last_n: int = 10
    ) -> list[MemoryNode]:
        """Session-ordered recent turns (ref: memory_store.py:426-477)."""
        nodes = [
            m
            for m in self._nodes.values()
            if m.user_id == user_id and m.memory_type == "working" and m.session_id == session_id
        ]
        nodes.sort(key=lambda m: m.created_at)
        return nodes[-last_n:]

    def stats(self, user_id: str | None = None) -> dict[str, int]:
        out = {t: 0 for t in MEMORY_TYPES}
        for m in self._nodes.values():
            if user_id is None or m.user_id == user_id:
                out[m.memory_type] += 1
        out["total"] = sum(out[t] for t in MEMORY_TYPES)
        return out

    async def cleanup_procedural(
        self, user_id: str, min_success_rate: float = 0.3, min_uses: int = 3
    ) -> int:
        """Drop skills that keep failing (ref: memory_toolkit.py:1777-1850)."""
        victims = [
            m.id
            for m in self._nodes.values()
            if m.user_id == user_id
            and m.memory_type == "procedural"
            and m.use_count >= min_uses
            and m.success_rate < min_success_rate
        ]
        return await self.delete(victims)
