import asyncio

import numpy as np
import pytest

from youtu_rag_tpu.core.config import (
    ChunkingConfig,
    IndexConfig,
    KnowledgeBuilderConfig,
    RetrieverConfig,
    VectorStoreConfig,
)
from youtu_rag_tpu.core.types import Document
from youtu_rag_tpu.ingest.builder import KnowledgeBuilder, make_chunk_id
from youtu_rag_tpu.models.embedder import HashEmbedder
from youtu_rag_tpu.retrieval.context import ContextAssembler
from youtu_rag_tpu.retrieval.retriever import HybridRetriever, VectorRetriever
from youtu_rag_tpu.retrieval.store import TpuVectorStore


def _store():
    return TpuVectorStore(
        VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=128))
    )


def _builder(store=None, embedder=None, **kw):
    return KnowledgeBuilder(
        store or _store(),
        embedder or HashEmbedder(dim=64),
        KnowledgeBuilderConfig(chunking=ChunkingConfig(chunk_size=200, chunk_overlap=20), **kw),
    )


DOCS = [
    Document("animals.md", "Cats purr when content. Dogs bark at strangers. " * 8, {"topic": "animals"}),
    Document("space.md", "Mars is the red planet. Jupiter has a great red spot. " * 8, {"topic": "space"}),
    Document("food.md", "Pizza with cheese and tomato. Sushi with rice and fish. " * 8, {"topic": "food"}),
]


def test_build_and_status():
    b = _builder()
    status = asyncio.run(b.build_from_documents(DOCS))
    assert status.status == "completed"
    assert status.processed_documents == 3
    assert status.total_chunks > 3
    assert status.errors == []
    assert asyncio.run(b.store.count()) == status.total_chunks


def test_build_idempotent_reinsert():
    b = _builder()
    s1 = asyncio.run(b.build_from_documents(DOCS))
    n1 = asyncio.run(b.store.count())
    s2 = asyncio.run(b.add_documents([DOCS[0]]))  # re-add same doc
    assert asyncio.run(b.store.count()) == n1  # replaced, not duplicated


def test_build_error_isolation():
    class ExplodingSplitter:
        def split_text(self, text, metadata=None):
            if "boom" in text:
                raise RuntimeError("boom")
            return [text]

    store = _store()
    b = KnowledgeBuilder(store, HashEmbedder(dim=64), KnowledgeBuilderConfig())
    b.splitter = ExplodingSplitter()
    docs = [Document("ok.md", "fine content"), Document("bad.md", "boom content")]
    status = asyncio.run(b.build_from_documents(docs))
    assert status.processed_documents == 1
    assert len(status.errors) == 1 and "bad.md" in status.errors[0]


def test_retriever_end_to_end():
    b = _builder()
    asyncio.run(b.build_from_documents(DOCS))
    r = VectorRetriever(
        b.store, b.embedder, RetrieverConfig(top_k=3, similarity_threshold=0.0)
    )
    hits = asyncio.run(r.retrieve("which planet is red? mars jupiter"))
    assert hits
    assert hits[0].chunk.document_id == "space.md"
    assert hits[0].rank == 1


def test_retriever_with_filters():
    b = _builder()
    asyncio.run(b.build_from_documents(DOCS))
    r = VectorRetriever(b.store, b.embedder, RetrieverConfig(top_k=5, similarity_threshold=0.0))
    hits = asyncio.run(r.retrieve("red planet mars", filters={"topic": "food"}))
    assert all(h.chunk.metadata["topic"] == "food" for h in hits)


def test_batch_retrieve_matches_single():
    b = _builder()
    asyncio.run(b.build_from_documents(DOCS))
    r = VectorRetriever(b.store, b.embedder, RetrieverConfig(top_k=3, similarity_threshold=0.0))
    queries = ["cats and dogs", "mars the red planet"]
    batched = asyncio.run(r.batch_retrieve(queries))
    singles = [asyncio.run(r.retrieve(q)) for q in queries]
    for bt, sg in zip(batched, singles):
        assert [x.chunk.id for x in bt] == [x.chunk.id for x in sg]


def test_retriever_rerank_path():
    from youtu_rag_tpu.models.reranker import LexicalReranker

    b = _builder()
    asyncio.run(b.build_from_documents(DOCS))
    r = VectorRetriever(
        b.store,
        b.embedder,
        RetrieverConfig(top_k=2, similarity_threshold=0.0, enable_reranking=True),
        reranker=LexicalReranker(),
    )
    hits = asyncio.run(r.retrieve("sushi with rice"))
    assert len(hits) == 2
    assert hits[0].chunk.document_id == "food.md"


def test_hybrid_retriever():
    b = _builder()
    asyncio.run(b.build_from_documents(DOCS))
    r = HybridRetriever(b.store, b.embedder, RetrieverConfig(top_k=3))
    hits = asyncio.run(r.retrieve("jupiter great red spot"))
    assert hits and hits[0].chunk.document_id == "space.md"


def test_context_assembler_styles():
    b = _builder()
    asyncio.run(b.build_from_documents(DOCS))
    r = VectorRetriever(b.store, b.embedder, RetrieverConfig(top_k=2, similarity_threshold=0.0))
    hits = asyncio.run(r.retrieve("pizza cheese"))
    ca = ContextAssembler(max_context_length=4000)
    md = ca.assemble(hits)
    assert md.startswith("## Context 1 (Relevance:")
    assert "**Metadata:**" in md and "chunk_index" not in md
    plain = ca.assemble(hits, format_style="plain")
    assert plain.startswith("Context 1:")
    import json

    js = json.loads(ca.assemble(hits, format_style="json"))
    assert js[0]["rank"] == 1
    assert ca.assemble([], format_style="markdown") == ""


def test_context_assembler_budget():
    b = _builder()
    asyncio.run(b.build_from_documents(DOCS))
    r = VectorRetriever(b.store, b.embedder, RetrieverConfig(top_k=5, similarity_threshold=0.0))
    hits = asyncio.run(r.retrieve("anything at all"))
    small = ContextAssembler(max_context_length=300).assemble(hits)
    assert len(small) <= 400  # one section + separators


def test_make_chunk_id_stable():
    a = make_chunk_id("doc", 0, "text")
    assert a == make_chunk_id("doc", 0, "text")
    assert a != make_chunk_id("doc", 1, "text")


def test_loaders_text_and_csv(tmp_path):
    from youtu_rag_tpu.ingest.loaders import load_document

    p = tmp_path / "note.md"
    p.write_text("# Hello\nworld")
    docs = load_document(str(p))
    assert docs[0].id == "note.md" and "world" in docs[0].content

    csv = tmp_path / "table.csv"
    csv.write_text("name,age\nalice,30\nbob,25\n")
    docs = load_document(str(csv))
    assert docs[0].metadata["n_rows"] == 2
    assert "alice" in docs[0].content


def test_loader_prefers_derived(tmp_path):
    from youtu_rag_tpu.ingest.loaders import load_document

    orig = tmp_path / "doc.txt"
    orig.write_text("original")
    (tmp_path / "doc_chunklevel.md").write_text("# derived\nhier")
    docs = load_document(str(orig))
    assert docs[0].metadata["derived"] == "chunklevel"
    assert docs[0].id == "doc.txt"
    docs = load_document(str(orig), prefer_derived=False)
    assert docs[0].content == "original"
