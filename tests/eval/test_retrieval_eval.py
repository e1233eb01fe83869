import asyncio

import pytest

from youtu_rag_tpu.core.config import IndexConfig, RAGConfig, VectorStoreConfig
from youtu_rag_tpu.core.types import Document
from youtu_rag_tpu.eval.retrieval_eval import (
    RetrievalBenchmark,
    mrr,
    ndcg_weighted_at_k,
    recall_at_k,
)
from youtu_rag_tpu.retrieval.kb import KnowledgeBase


def test_metric_math():
    assert recall_at_k(["a", "b", "c"], {"a", "c", "d"}) == pytest.approx(2 / 3)
    assert recall_at_k(["a", "b", "c"], {"a", "c"}, k=1) == pytest.approx(0.5)
    assert mrr(["x", "a"], {"a"}) == 0.5
    assert mrr(["x"], {"a"}) == 0.0
    # perfect ordering → 1.0
    assert ndcg_weighted_at_k(["a", "b"], {"a", "b"}, k=5) == pytest.approx(1.0)
    # relevant item at rank 2 of 1 → dcg 1/log2(3) over ideal 1
    assert ndcg_weighted_at_k(["x", "a"], {"a"}, k=5) == pytest.approx(1 / 1.5849625007)


def test_benchmark_end_to_end():
    cfg = RAGConfig(
        vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=128))
    )
    kb = KnowledgeBase("releval", cfg)
    docs = [
        Document("solar.md", "the sun is a star at the center of the solar system. " * 5, {"topic": "space"}),
        Document("lunar.md", "the moon orbits the earth and causes tides. " * 5, {"topic": "space"}),
        Document("bread.md", "bread baking requires flour yeast and patience. " * 5, {"topic": "food"}),
    ]
    asyncio.run(kb.build_documents(docs))
    qrels = [
        {"query": "what is at the center of the solar system", "relevant": ["solar.md"]},
        {"query": "moon tides earth", "relevant": ["lunar.md"]},
        {"query": "baking with flour and yeast", "relevant": ["bread.md"], "filters": {"topic": "food"}},
    ]
    bench = RetrievalBenchmark(kb, top_k=3)
    samples = bench.load_qrels(qrels)
    report = asyncio.run(bench.run(samples))
    assert report["recall_at_all"] == 1.0
    assert report["ndcg_w_at_5"] > 0.9
    assert report["mrr"] == 1.0


def test_qrels_file_loading(tmp_path):
    p = tmp_path / "qrels.jsonl"
    p.write_text('{"query": "q1", "relevant": ["d1"]}\n{"query": "q2", "relevant": ["d2", "d3"], "filters": {"a": 1}}\n')
    samples = RetrievalBenchmark.load_qrels(p)
    assert len(samples) == 2
    assert samples[1].relevant == {"d2", "d3"}
    assert samples[1].filters == {"a": 1}
