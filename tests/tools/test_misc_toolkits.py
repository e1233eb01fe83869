import asyncio
import json

import pandas as pd
import pytest

from youtu_rag_tpu.tools import TOOLKIT_MAP, get_toolkit
from youtu_rag_tpu.tools.base import ToolkitConfig


def test_registry_coverage():
    from youtu_rag_tpu.tools import builtin  # noqa: F401

    expected = {
        "kb_search", "meta_retrieval", "text2sql", "memory", "rag",
        "python_executor", "bash", "file", "search", "wikipedia", "arxiv",
        "github", "document", "tabular", "user_interaction", "codesnip",
        "memory_simple", "image", "audio", "video",
    }
    assert expected <= set(TOOLKIT_MAP), sorted(expected - set(TOOLKIT_MAP))


def test_tabular_toolkit(tmp_path):
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "x"]})
    p = tmp_path / "t.csv"
    df.to_csv(p, index=False)
    tk = get_toolkit("tabular")
    out = asyncio.run(tk.call_tool("tabular_overview", {"path": str(p)}))
    assert "3 rows x 2 cols" in out
    stats = json.loads(asyncio.run(tk.call_tool("tabular_column_stats", {"path": str(p), "column": "a"})))
    assert stats["mean"] == 2.0
    out = asyncio.run(tk.call_tool("tabular_column_stats", {"path": str(p), "column": "zz"}))
    assert out.startswith("Error")


def test_user_interaction_with_fn():
    tk = get_toolkit("user_interaction", ToolkitConfig(config={"ask_fn": lambda q: f"answer to: {q}"}))
    out = asyncio.run(tk.call_tool("ask_user", {"question": "which file?"}))
    assert out == "answer to: which file?"


def test_codesnip():
    tk = get_toolkit("codesnip")
    assert asyncio.run(tk.call_tool("run_snippet", {"code": "print(6*7)"})) == "42"


def test_simple_memory(tmp_path):
    tk = get_toolkit("memory_simple", ToolkitConfig(config={"path": str(tmp_path / "mem.jsonl")}))
    asyncio.run(tk.call_tool("remember", {"note": "prefer bf16"}))
    asyncio.run(tk.call_tool("remember", {"note": "block rows 2048"}))
    out = asyncio.run(tk.call_tool("recall", {"keyword": "bf16"}))
    assert "prefer bf16" in out and "2048" not in out


def test_media_toolkits_gated(tmp_path):
    p = tmp_path / "img.png"
    p.write_bytes(b"fake")
    tk = get_toolkit("image")
    out = asyncio.run(tk.call_tool("image_qa", {"path": str(p), "question": "?"}))
    assert "YRT_VISION_URL" in out


def test_rag_toolkit_roundtrip():
    from youtu_rag_tpu.core.config import IndexConfig, RAGConfig, VectorStoreConfig
    from youtu_rag_tpu.retrieval.kb import KnowledgeBase

    kb = KnowledgeBase(
        "ragtk",
        RAGConfig(vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=128))),
    )
    tk = get_toolkit("rag", ToolkitConfig(config={"kb": kb}))
    out = asyncio.run(
        tk.call_tool("rag_build", {"texts": ["jupiter is the largest planet", "cats are small felines"]})
    )
    assert "2 documents" in out
    out = asyncio.run(tk.call_tool("rag_retrieve", {"query": "largest planet jupiter", "top_k": 1}))
    assert "jupiter" in out
    stats = json.loads(asyncio.run(tk.call_tool("rag_stats", {})))
    assert stats["chunks"] >= 2
    out = asyncio.run(tk.call_tool("rag_clear", {}))
    assert "cleared" in out


def test_orchestra_react_sql_factory(tmp_path):
    from youtu_rag_tpu.agents.factory import get_agent
    from youtu_rag_tpu.agents.llm import FakeChatClient
    from youtu_rag_tpu.agents.orchestra import OrchestraAgent

    agent = get_agent({"type": "orchestra_react_sql"}, client=FakeChatClient())
    assert isinstance(agent, OrchestraAgent)
    assert "text2sql" in agent._workers
