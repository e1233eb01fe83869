"""Corpus-level BM25 inverted index + hybrid fusion robustness.

The scenario that motivated retrieval/lexical.py: a *weak* dense encoder
whose candidate pool never contains the needle chunk. Pool-rescoring
hybrid (the old implementation) cannot recover it; corpus-level lexical
fusion must."""

import asyncio

import numpy as np
import pytest

from youtu_rag_tpu.core.config import (
    IndexConfig,
    RetrieverConfig,
    VectorStoreConfig,
)
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.retrieval.lexical import LexicalInvertedIndex
from youtu_rag_tpu.retrieval.retriever import HybridRetriever
from youtu_rag_tpu.retrieval.store import TpuVectorStore


def _chunk(i, content, doc="d", **meta):
    return Chunk(id=f"c{i}", document_id=doc, content=content, chunk_index=i, metadata=meta)


# ---------------------------------------------------------------- unit level


def test_inverted_index_exact_term_recall():
    ix = LexicalInvertedIndex()
    ix.add([
        _chunk(0, "the committee reviewed quarterly findings"),
        _chunk(1, "registry number assigned to artifact-Q17 is 55443"),
        _chunk(2, "funding remained stable across the period"),
    ])
    hits = ix.search("what is the registry number of artifact-Q17?", top_k=2)
    assert hits and hits[0][0] == "c1"


def test_inverted_index_delete_and_df_consistency():
    ix = LexicalInvertedIndex()
    ix.add([_chunk(i, f"shared token alpha plus unique token beta{i}") for i in range(4)])
    assert len(ix) == 4
    ix.delete(["c0", "c1"])
    assert len(ix) == 2
    assert ix.search("beta0", top_k=5) == []
    assert ix.search("beta2", top_k=5)[0][0] == "c2"
    # postings for fully-deleted terms are dropped (no leak)
    assert all(plist for plist in ix._postings.values())
    stats = ix.stats()
    assert stats["documents"] == 2


def test_inverted_index_delete_by_document():
    ix = LexicalInvertedIndex()
    ix.add([_chunk(0, "cats purr", doc="a"), _chunk(1, "dogs bark", doc="a"),
            _chunk(2, "fish swim", doc="b")])
    assert ix.delete_by_document("a") == 2
    assert len(ix) == 1
    assert ix.search("cats", top_k=3) == []


def test_inverted_index_reinsert_replaces():
    ix = LexicalInvertedIndex()
    ix.add([_chunk(0, "old contents mentioning zebras")])
    ix.add([_chunk(0, "new contents mentioning yaks")])
    assert len(ix) == 1
    assert ix.search("zebras", top_k=3) == []
    assert ix.search("yaks", top_k=3)[0][0] == "c0"


def test_inverted_index_predicate_filtering():
    ix = LexicalInvertedIndex()
    ix.add([_chunk(0, "needle fact one"), _chunk(1, "needle fact two")])
    hits = ix.search("needle fact", top_k=5, predicate=lambda cid: cid == "c1")
    assert [h[0] for h in hits] == ["c1"]


# ------------------------------------------------------------- store + hybrid


class _WeakEmbedder:
    """Dense embeddings that carry no lexical signal at all: every text
    maps to a direction independent of content overlap (seeded by length
    only), so dense retrieval is essentially random — the NIAH failure
    mode of an underfit encoder."""

    dimension = 32

    async def embed_texts(self, texts):
        out = []
        for t in texts:
            rng = np.random.default_rng(len(t) % 7)
            v = rng.standard_normal(32)
            out.append((v / np.linalg.norm(v)).tolist())
        return out

    async def embed_query(self, text):
        return (await self.embed_texts([text]))[0]


def _corpus_store(n_filler=120):
    store = TpuVectorStore(
        VectorStoreConfig(backend="numpy", index=IndexConfig(min_capacity=256, block_rows=128))
    )
    emb = _WeakEmbedder()

    async def build():
        fill = [
            _chunk(i, f"routine observation {i} about field calibration and protocols",
                   doc=f"f{i}")
            for i in range(n_filler)
        ]
        needle = _chunk(999, "The registry number assigned to artifact-Z9 is 71205.",
                        doc="needle_doc", kind="needle")
        chunks = fill + [needle]
        embs = await emb.embed_texts([c.content for c in chunks])
        for c, e in zip(chunks, embs):
            c.embedding = e
        await store.add_chunks(chunks)

    asyncio.run(build())
    return store, emb


def test_hybrid_recovers_needle_with_weak_dense():
    store, emb = _corpus_store()
    r = HybridRetriever(store, emb, RetrieverConfig(top_k=5, similarity_threshold=0.0))
    results = asyncio.run(r.retrieve("registry number of artifact-Z9?"))
    assert any(res.chunk.id == "c999" for res in results), (
        "corpus-level lexical fusion must surface the exact-term needle"
    )
    # scores stay in a sane [0,1]-ish range for downstream cutoffs
    assert all(-1.0 <= res.score <= 1.5 for res in results)


def test_hybrid_pool_fallback_without_lexical_index():
    store = TpuVectorStore(
        VectorStoreConfig(
            backend="numpy",
            lexical_index=False,
            index=IndexConfig(min_capacity=256, block_rows=128),
        )
    )
    emb = _WeakEmbedder()

    async def build():
        chunks = [_chunk(i, f"filler text {i}", doc=f"f{i}") for i in range(8)]
        embs = await emb.embed_texts([c.content for c in chunks])
        for c, e in zip(chunks, embs):
            c.embedding = e
        await store.add_chunks(chunks)

    asyncio.run(build())
    assert store._lexical is None
    r = HybridRetriever(store, emb, RetrieverConfig(top_k=3, similarity_threshold=0.0))
    results = asyncio.run(r.retrieve("filler text 3"))
    assert results  # degrades gracefully to dense-pool rescoring


def test_hybrid_respects_filters_on_lexical_side():
    store, emb = _corpus_store(n_filler=30)
    r = HybridRetriever(store, emb, RetrieverConfig(top_k=5, similarity_threshold=0.0))
    results = asyncio.run(
        r.retrieve("registry number of artifact-Z9?", filters={"kind": {"$eq": "needle"}})
    )
    assert results and all(res.chunk.metadata.get("kind") == "needle" for res in results)


def test_store_delete_drops_lexical_hit():
    store, emb = _corpus_store(n_filler=20)
    asyncio.run(store.delete(["c999"]))
    hits = asyncio.run(store.lexical_search("artifact-Z9 registry", top_k=5))
    assert all(c.id != "c999" for c, _ in hits)


def test_store_delete_by_document_drops_lexical_hit():
    store, emb = _corpus_store(n_filler=20)
    asyncio.run(store.delete_by_document_id("needle_doc"))
    hits = asyncio.run(store.lexical_search("artifact-Z9 registry", top_k=5))
    assert all(c.id != "c999" for c, _ in hits)


def test_rebuild_lexical_from_live_chunks():
    store, emb = _corpus_store(n_filler=10)
    store._lexical.clear()
    assert asyncio.run(store.lexical_search("artifact-Z9", top_k=3)) == []
    store.rebuild_lexical()
    hits = asyncio.run(store.lexical_search("artifact-Z9", top_k=3))
    assert hits and hits[0][0].id == "c999"


def test_monitor_exposes_lexical_stats():
    import asyncio as _aio

    from youtu_rag_tpu.retrieval.monitoring import StorageMonitor

    store, _ = _corpus_store(n_filler=10)
    mon = StorageMonitor(store, name="kb")
    metrics = _aio.run(mon.collect_metrics())
    lex = metrics["lexical_index"]
    assert lex["documents"] == 11 and lex["terms"] > 0
