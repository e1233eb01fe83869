"""configs[0]-style slice at reduced scale: a multi-topic corpus through
loaders → chunker → (native) hash embedder → device index → retrieval,
with topic-recall assertions. The full ~10k-chunk corpus runs via
scripts/cli_chat.py in ~6 s on CPU (validated manually; this test keeps
the suite fast at ~2k chunks)."""

import asyncio
import random

import pytest

from youtu_rag_tpu.core.config import ChunkingConfig, IndexConfig, KnowledgeBuilderConfig, RAGConfig, VectorStoreConfig
from youtu_rag_tpu.core.types import Document
from youtu_rag_tpu.retrieval.kb import KnowledgeBase

TOPICS = ["astronomy", "baking", "cycling", "databases", "economics"]


def _corpus(files_per_topic=8, paras=12):
    random.seed(7)
    docs = []
    for t in TOPICS:
        vocab = [f"{t}_{w}" for w in ("core", "method", "theory", "practice", "metric")]
        for i in range(files_per_topic):
            body = []
            for p in range(paras):
                words = random.choices(vocab, k=25) + random.choices(["the", "of", "shows"], k=8)
                random.shuffle(words)
                body.append(" ".join(words) + ".")
            docs.append(
                Document(f"{t}_{i}.md", f"# {t} notes\n\n" + "\n\n".join(body), {"topic": t})
            )
    return docs


@pytest.fixture(scope="module")
def kb10k():
    cfg = RAGConfig(
        knowledge_builder=KnowledgeBuilderConfig(
            chunking=ChunkingConfig(chunk_size=400, chunk_overlap=40)
        ),
        vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=2048, block_rows=256)),
    )
    kb = KnowledgeBase("slice", cfg)
    status = asyncio.run(kb.build_documents(_corpus()))
    assert status.status == "completed" and status.errors == []
    return kb, status


def test_scale_build(kb10k):
    kb, status = kb10k
    assert status.total_chunks > 500
    assert asyncio.run(kb.store.count()) == status.total_chunks


def test_topic_recall_at_scale(kb10k):
    kb, _ = kb10k
    for topic in TOPICS:
        hits = asyncio.run(
            kb.search(f"{topic}_theory {topic}_metric {topic}_core", top_k=10, similarity_threshold=0.0)
        )
        top_topics = [h.chunk.metadata["topic"] for h in hits]
        assert top_topics.count(topic) >= 9, (topic, top_topics)


def test_filtered_topic_at_scale(kb10k):
    kb, _ = kb10k
    hits = asyncio.run(
        kb.search("baking_theory", top_k=5, filters={"topic": "economics"}, similarity_threshold=0.0)
    )
    assert hits and all(h.chunk.metadata["topic"] == "economics" for h in hits)


def test_profiler_hook_noop():
    from youtu_rag_tpu.tracing.profiler import device_trace

    with device_trace("test", enabled=False) as out:
        assert out is None
