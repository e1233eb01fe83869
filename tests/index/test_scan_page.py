"""Store-level filter+offset pushdown (VERDICT r2 weak #5): page views
materialize O(limit) chunks and the uncounted scan stops early."""

import asyncio

import numpy as np
import pytest

from youtu_rag_tpu.core.config import VectorStoreConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.retrieval.store import TpuVectorStore


@pytest.fixture
def store():
    s = TpuVectorStore(VectorStoreConfig(backend="numpy"))
    rng = np.random.default_rng(0)
    chunks = []
    for i in range(2000):
        chunks.append(
            Chunk(
                f"c{i}", f"d{i // 100}", f"content number {i} " + ("needle" if i % 7 == 0 else "hay"),
                i % 100,
                metadata={"index_type": "index_content" if i % 2 == 0 else "index_summary"},
                embedding=rng.normal(size=8).astype(np.float32).tolist(),
            )
        )
    asyncio.run(s.add_chunks(chunks))
    return s


def run(coro):
    return asyncio.run(coro)


def test_scan_page_offset_and_count(store):
    page, matched = run(store.scan_page({"index_type": "index_content"}, limit=10, offset=20))
    assert matched == 1000
    assert len(page) == 10
    # pages are disjoint and ordered by insertion
    page2, _ = run(store.scan_page({"index_type": "index_content"}, limit=10, offset=30))
    assert {c.id for c in page} & {c.id for c in page2} == set()
    assert page[0].id == "c40"  # 21st even-index chunk (offset 20)


def test_scan_page_text_pushdown(store):
    page, matched = run(store.scan_page(None, limit=5, offset=0, text="NEEDLE"))
    assert matched == len([i for i in range(2000) if i % 7 == 0])
    assert len(page) == 5
    assert all("needle" in c.content for c in page)


def test_uncounted_scan_stops_early(store):
    seen = {"n": 0}
    orig = store._index.iter_live

    def counting_iter():
        for c in orig():
            seen["n"] += 1
            yield c

    store._index.iter_live = counting_iter
    page = run(store.get_by_filter({}, limit=10, offset=0))
    assert len(page) == 10
    # O(limit) iteration, not the whole 2000-chunk KB
    assert seen["n"] == 10


def test_get_by_filter_compat(store):
    """Legacy callers (limit-only) keep their exact semantics."""
    out = run(store.get_by_filter({"index_type": "index_summary"}, limit=3))
    assert len(out) == 3 and all(
        c.metadata["index_type"] == "index_summary" for c in out
    )
    everything = run(store.get_by_filter({}, limit=None))
    assert len(everything) == 2000
