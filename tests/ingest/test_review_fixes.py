"""Regression pins for the ingest review findings: hichunk progress,
stride guard, header-only sections, cleanup doc-id alias, read-only SQL
authorizer, uppercase extensions, duplicate-sheet chunk ids."""

import asyncio

import numpy as np
import pandas as pd
import pytest

from youtu_rag_tpu.core.config import ChunkingConfig
from youtu_rag_tpu.ingest.chunker import HierarchicalMarkdownSplitter, RecursiveTextSplitter
from youtu_rag_tpu.ingest.hichunk import HiChunkEngine
from youtu_rag_tpu.ingest.tables import TableStore


# ---------------------------------------------------------------- hichunk


def test_hichunk_progresses_when_carry_fills_window():
    """Tiny window vs long sentences: the carry alone can fill the
    budget — every window must still consume ≥1 new sentence (this
    configuration used to loop forever)."""
    eng = HiChunkEngine(window_size=120, line_max_len=100, residual_lines=4)
    text = " ".join("x" * 90 + f"end{i}." for i in range(12))
    sentences, points = asyncio.run(
        asyncio.wait_for(eng.chunk_points(text), timeout=30)
    )
    assert len(sentences) >= 12


# ---------------------------------------------------------------- chunker


def test_fixed_windows_overlap_ge_size():
    """overlap >= size passes config validation; the splitter must not
    return zero chunks (or crash on a zero stride)."""
    for overlap in (100, 200):
        cfg = ChunkingConfig(chunk_size=100, chunk_overlap=overlap)
        sp = RecursiveTextSplitter(cfg)
        text = "长句没有分隔符" * 40  # no separator matches → fixed windows
        out = sp.split_text(text)
        assert out, f"overlap={overlap} produced no chunks"
        assert "".join(out).find(text[:50]) != -1 or text[:50] in out[0]


def test_header_only_sections_are_kept():
    sp = HierarchicalMarkdownSplitter(ChunkingConfig(chunk_size=200, chunk_overlap=0))
    out = sp.split_text("# Overview\n# Details\nbody text here")
    joined = "\n".join(out)
    assert "Overview" in joined  # used to be silently dropped
    assert "Details" in joined and "body text here" in joined


# ---------------------------------------------------------------- tables


@pytest.fixture
def tstore(tmp_path):
    return TableStore(tmp_path / "t.db")


def test_execute_sql_blocks_cte_writes_and_pragma(tstore):
    tstore.store_dataframe("kb", "s.csv", "sales", pd.DataFrame({"a": [1, 2]}))
    ok = tstore.execute_sql("SELECT a FROM sales ORDER BY a")
    assert ok["rows"] == [[1], [2]]
    # recursive CTE reads stay fine
    rec = tstore.execute_sql(
        "WITH RECURSIVE c(x) AS (SELECT 1 UNION ALL SELECT x+1 FROM c WHERE x < 3) SELECT x FROM c"
    )
    assert rec.get("rows") == [[1], [2], [3]]
    # CTE-wrapped write passes the prefix regex but must be denied
    denied = tstore.execute_sql("WITH x AS (SELECT 1) DELETE FROM kb_tables")
    assert "error" in denied
    assert "error" in tstore.execute_sql("PRAGMA writable_schema=1")
    assert "error" in tstore.execute_sql("ATTACH DATABASE ':memory:' AS evil")
    # registry untouched
    assert tstore.tables_for_kb("kb")


def test_table_name_collision_across_sources(tstore):
    t1 = tstore.store_dataframe("kb", "a/sales.xlsx", "sales_Sheet1", pd.DataFrame({"x": [1]}))
    t2 = tstore.store_dataframe("kb", "b/sales.xlsx", "sales_Sheet1", pd.DataFrame({"x": [9]}))
    assert t1 != t2  # second source got a disambiguated name
    assert tstore.execute_sql(f'SELECT x FROM "{t1}"')["rows"] == [[1]]
    assert tstore.execute_sql(f'SELECT x FROM "{t2}"')["rows"] == [[9]]
    # same source re-storing keeps its name (idempotent rebuild)
    t1b = tstore.store_dataframe("kb", "a/sales.xlsx", "sales_Sheet1", pd.DataFrame({"x": [5]}))
    assert t1b == t1


# ---------------------------------------------------------------- loaders


def test_uppercase_extensions(tmp_path):
    from youtu_rag_tpu.ingest.loaders import load_document

    p = tmp_path / "DATA.CSV"
    pd.DataFrame({"a": [1, 2], "b": [3, 4]}).to_csv(p, index=False)
    docs = load_document(str(p))
    assert docs and "a" in docs[0].content


# ---------------------------------------------------------------- cleanup alias


def test_cleanup_path_source_alias(tmp_path):
    from youtu_rag_tpu.core.config import IndexConfig, VectorStoreConfig
    from youtu_rag_tpu.core.types import Chunk
    from youtu_rag_tpu.ingest.cleanup import KnowledgeCleanupManager
    from youtu_rag_tpu.retrieval.store import TpuVectorStore

    async def go():
        cfg = VectorStoreConfig(index=IndexConfig(min_capacity=128, block_rows=64))
        store = TpuVectorStore(cfg)
        emb = np.random.default_rng(0).normal(size=(2, 64)).astype(np.float32)
        # loader convention: path-style source indexes under the BASENAME
        chunks = [
            Chunk(f"c{i}", "file.txt", f"text {i}", i, {}, embedding=emb[i].tolist())
            for i in range(2)
        ]
        await store.add_chunks(chunks)
        mgr = KnowledgeCleanupManager("kb", store, TableStore(tmp_path / "c.db"))
        # the source is configured by PATH — must not be treated as removed
        removed = await mgr.cleanup_removed_sources(["docs/file.txt"])
        assert removed == []
        assert await store.count() == 2
        # explicit cleanup by path deletes the basename-aliased chunks
        res = await mgr.cleanup_source("docs/file.txt")
        assert res["deleted_chunks"] == 2
        assert await store.count() == 0

    asyncio.run(go())


# ---------------------------------------------------------------- excel ids


def test_duplicate_sheets_get_distinct_chunk_ids(tmp_path, monkeypatch):
    # two IDENTICAL sheets (the duplicate-chunk-id regression case)
    monkeypatch.setattr(
        pd,
        "read_excel",
        lambda *_a, **_k: {
            "S1": pd.DataFrame({"a": range(10), "b": range(10)}),
            "S2": pd.DataFrame({"a": range(10), "b": range(10)}),
        },
    )
    from youtu_rag_tpu.core.config import IndexConfig, KnowledgeBuilderConfig, VectorStoreConfig
    from youtu_rag_tpu.ingest.processors import ExcelProcessor, ProcessorContext, SourceTask
    from youtu_rag_tpu.models.embedder import HashEmbedder
    from youtu_rag_tpu.retrieval.store import TpuVectorStore

    df = pd.DataFrame({"a": range(10), "b": range(10)})
    p = tmp_path / "wb.xlsx"
    p.write_bytes(b"placeholder")  # read_excel is stubbed (no openpyxl in image)

    async def go():
        cfg = VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=64))
        store = TpuVectorStore(cfg)
        ctx = ProcessorContext(
            "kb", store, HashEmbedder(dim=64), TableStore(tmp_path / "x.db"),
            KnowledgeBuilderConfig(),
        )
        proc = ExcelProcessor(ctx)
        res = await proc.process(SourceTask(source_id="wb.xlsx", path=str(p), kind="table"))
        assert res.ok
        # identical sheets → distinct chunk ids → everything stored
        n = await store.count()
        assert n == res.chunks
        # content chunk_index forms one per-document sequence
        idx = store._index
        content = [
            c for c in idx.iter_live() if (c.metadata or {}).get("index_type") == "index_content"
        ]
        indexes = sorted(c.chunk_index for c in content)
        assert indexes == list(range(len(content)))

    asyncio.run(go())
