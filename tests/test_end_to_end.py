"""The minimum end-to-end slice (SURVEY.md §7): corpus → chunk → embed →
device index → agent with KB tools → answer. Hermetic: hash embedder +
FakeChatClient standing in for the LLM."""

import asyncio
import json

from youtu_rag_tpu.agents.config import AgentConfig
from youtu_rag_tpu.agents.llm import FakeChatClient
from youtu_rag_tpu.agents.simple_agent import SimpleAgent
from youtu_rag_tpu.core.config import IndexConfig, RAGConfig, VectorStoreConfig
from youtu_rag_tpu.core.types import Document
from youtu_rag_tpu.retrieval.kb import GLOBAL_KB_REGISTRY, KnowledgeBase
from youtu_rag_tpu.tools.base import ToolkitConfig
from youtu_rag_tpu.tools.kb_search import KBSearchToolkit

CORPUS = [
    Document(
        "tpu-guide.md",
        "# TPU guide\nThe MXU is a 128x128 systolic array. "
        "bfloat16 matmuls reach peak throughput on the MXU. "
        "HBM bandwidth is usually the bottleneck for inference workloads.",
        {"source": "tpu-guide.md", "topic": "hardware"},
    ),
    Document(
        "jax-notes.md",
        "# JAX notes\nUse jax.jit to compile functions. "
        "Shard arrays with NamedSharding over a Mesh. "
        "Collectives like psum ride the ICI links between chips.",
        {"source": "jax-notes.md", "topic": "software"},
    ),
    Document(
        "recipes.md",
        "# Recipes\nTomato soup needs ripe tomatoes and basil. "
        "Bread requires flour, water, yeast and patience.",
        {"source": "recipes.md", "topic": "cooking"},
    ),
]


def _make_kb(name="e2e") -> KnowledgeBase:
    cfg = RAGConfig(
        name=name,
        vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=128)),
    )
    kb = KnowledgeBase(name, cfg)
    GLOBAL_KB_REGISTRY.register(kb)
    return kb


def test_build_then_agent_answers():
    kb = _make_kb()
    status = asyncio.run(kb.build_documents(CORPUS))
    assert status.status == "completed"

    # the scripted "LLM" calls the KB tool then answers from its output
    client = FakeChatClient(
        scripted=[
            FakeChatClient.tool_response(
                "kb_embedding_search", {"query": "MXU systolic array size", "top_k": 3}
            ),
            FakeChatClient.text_response("The MXU is a 128x128 systolic array."),
        ]
    )
    toolkit = KBSearchToolkit(ToolkitConfig(config={"kb": kb}))
    agent = SimpleAgent(AgentConfig(), client=client, toolkits=[toolkit])
    rec = asyncio.run(agent.run("How big is the MXU?"))

    assert rec.final_output == "The MXU is a 128x128 systolic array."
    tool_out = rec.tool_calls[0].output
    assert "systolic array" in tool_out
    assert "tpu-guide.md" in tool_out  # right document retrieved


def test_kb_tools_surface():
    kb = _make_kb("e2e2")
    asyncio.run(kb.build_documents(CORPUS))
    tk = KBSearchToolkit(ToolkitConfig(config={"kb": kb}))

    out = asyncio.run(tk.call_tool("kb_embedding_search", {"query": "bread flour yeast", "top_k": 2}))
    assert "recipes.md" in out

    out = asyncio.run(
        tk.call_tool(
            "kb_embedding_search",
            {"query": "bandwidth", "filters": json.dumps({"topic": "software"})},
        )
    )
    assert "jax-notes.md" in out and "tpu-guide.md" not in out

    out = asyncio.run(tk.call_tool("kb_file_search", {"query": "cooking tomato", "top_k": 1}))
    assert out.splitlines()[0].startswith("[1] recipes.md")

    out = asyncio.run(
        tk.call_tool(
            "kb_rerank",
            {"query": "systolic array", "candidates": ["about bread", "the MXU systolic array"], "top_k": 1},
        )
    )
    assert "systolic" in out

    stats = json.loads(asyncio.run(tk.call_tool("kb_stats", {})))
    assert stats["chunks"] >= 3


def test_meta_retrieval_temporal_flow():
    from youtu_rag_tpu.tools.meta_retrieval import MetaRetrievalToolkit

    kb = _make_kb("e2e3")
    docs = [
        Document(
            f"news-{y}.md",
            f"# News {y}\nIn {y} the flagship chip shipped with more memory.",
            {"source": f"news-{y}.md", "publish_ts": int(__import__("datetime").datetime(y, 6, 1).timestamp())},
        )
        for y in (2021, 2022, 2023)
    ]
    asyncio.run(kb.build_documents(docs))
    tk = MetaRetrievalToolkit(ToolkitConfig(config={"kb": kb, "time_key": "publish_ts"}))

    analysis = json.loads(
        asyncio.run(tk.call_tool("query_analysis", {"query": "chip news in 2022", "session_id": "s"}))
    )
    assert analysis["has_temporal_intent"]

    out = asyncio.run(
        tk.call_tool("kb_embedding_search", {"query": "flagship chip", "session_id": "s", "top_k": 3})
    )
    assert "news-2022.md" in out and "news-2021.md" not in out

    asyncio.run(tk.call_tool("expand_filter_scope", {"session_id": "s", "factor": 40.0}))
    out = asyncio.run(
        tk.call_tool("kb_embedding_search", {"query": "flagship chip", "session_id": "s", "top_k": 3})
    )
    assert "news-2021.md" in out  # widened window now covers 2021

    merged = asyncio.run(tk.call_tool("merge_retrieval_results", {"session_id": "s"}))
    assert "news-2022.md" in merged


def test_meta_retrieval_popularity_preference():
    """'most popular X' queries blend popularity metadata into ranking
    (ref: the Popularity Preference axis, README.md:816-882): docs with
    near-identical text separate by downloads, not similarity."""
    from youtu_rag_tpu.tools.meta_retrieval import (
        MetaRetrievalToolkit,
        detect_preference,
        popularity_blend,
    )

    assert detect_preference("the most popular parser for logs") == "popularity"
    assert detect_preference("most-cited paper on attention") == "popularity"
    assert detect_preference("the 2022 annual report") is None

    kb = _make_kb("e2e4")
    docs = [
        Document(
            f"lib-{v}.md",
            f"# Library {v}\nA data ingestion toolkit, variant {v}, for parsing logs.",
            {"source": f"lib-{v}.md", "downloads": dl},
        )
        for v, dl in (("a", 100), ("b", 90000), ("c", 5000))
    ]
    asyncio.run(kb.build_documents(docs))
    tk = MetaRetrievalToolkit(ToolkitConfig(config={"kb": kb}))

    analysis = json.loads(
        asyncio.run(
            tk.call_tool(
                "query_analysis",
                {"query": "the most popular data ingestion toolkit", "session_id": "p"},
            )
        )
    )
    assert analysis["preference"] == "popularity"
    out = asyncio.run(
        tk.call_tool(
            "kb_embedding_search",
            {"query": "data ingestion toolkit for parsing logs", "session_id": "p", "top_k": 1},
        )
    )
    assert "lib-b.md" in out  # highest downloads wins at equal similarity

    # unit: blend resorts by popularity at equal similarity, keeps ranks
    from youtu_rag_tpu.core.types import Chunk, RetrievalResult

    results = [
        RetrievalResult(Chunk(f"c{i}", f"d{i}", "x", 0, {"downloads": dl}), 0.9, i + 1)
        for i, dl in enumerate([10, 1000, 500])
    ]
    blended = popularity_blend(results, top_k=3)
    assert [r.chunk.document_id for r in blended] == ["d1", "d2", "d0"]
    assert [r.rank for r in blended] == [1, 2, 3]
