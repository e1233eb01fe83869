"""Span coverage of the retrieval + ingest hot paths (§5.1): a retrieve
emits embedding + vector_search spans in one trace; a staged build emits
per-source ingest spans with chunk counts."""

import asyncio

from youtu_rag_tpu.core.config import IndexConfig, RAGConfig, VectorStoreConfig
from youtu_rag_tpu.core.types import Document
from youtu_rag_tpu.ingest.agent import BuildRequest, KnowledgeBuilderAgent
from youtu_rag_tpu.ingest.processors import SourceTask
from youtu_rag_tpu.retrieval.kb import KnowledgeBase
from youtu_rag_tpu.tracing.tracer import get_tracer


def _kb(name):
    return KnowledgeBase(
        name,
        RAGConfig(vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=64))),
    )


def test_retrieve_emits_embed_and_search_spans():
    kb = _kb("tr1")
    asyncio.run(kb.build_documents([Document("d1", "span coverage test doc")]))
    tracer = get_tracer()
    start = len(tracer.spans)
    asyncio.run(kb.retriever.retrieve("coverage", top_k=2, similarity_threshold=0.0))
    new = tracer.spans[start:]
    kinds = {(s.kind, s.name) for s in new}
    assert ("embedding", "embed_queries") in kinds
    assert ("retrieval", "vector_search") in kinds
    search = next(s for s in new if s.name == "vector_search")
    assert search.attributes["hits"] >= 1 and search.end_time is not None
    # both spans share the retrieve call's trace
    trace_ids = {s.trace_id for s in new if s.name in ("embed_queries", "vector_search")}
    assert len(trace_ids) >= 1


def test_build_emits_per_source_ingest_spans():
    kb = _kb("tr2")
    tracer = get_tracer()
    start = len(tracer.spans)
    agent = KnowledgeBuilderAgent("tr2", kb.store, kb.embedder, tables=kb.tables)
    report = asyncio.run(
        agent.build(
            BuildRequest(
                kb_name="tr2",
                tasks=[
                    SourceTask("s1", "text", document=Document("s1", "first doc")),
                    SourceTask("s2", "text", document=Document("s2", "second doc")),
                ],
            )
        )
    )
    assert report.processed == 2
    ingest_spans = [s for s in tracer.spans[start:] if s.kind == "ingest"]
    assert {s.attributes["source"] for s in ingest_spans} == {"s1", "s2"}
    assert all(s.attributes["chunks"] >= 1 for s in ingest_spans)
