import asyncio

import pytest

from youtu_rag_tpu.agents.config import AgentConfig, ContextManagerConfig, EnvConfig
from youtu_rag_tpu.agents.context import (
    CompactifyContextManager,
    NoOpContextManager,
    get_context_manager,
    rough_token_count,
)
from youtu_rag_tpu.agents.env import BasicEnv, ShellLocalEnv, get_env
from youtu_rag_tpu.agents.llm import ChatMessage, FakeChatClient
from youtu_rag_tpu.agents.simple_agent import SimpleAgent


def test_token_estimate():
    assert rough_token_count("aaaa bbbb cccc dddd") == 4
    assert rough_token_count("你好世界") == 4
    assert rough_token_count(None) == 0


def test_compactify_under_budget_untouched():
    cm = CompactifyContextManager(max_tokens=1000)
    msgs = [ChatMessage("system", "sys"), ChatMessage("user", "short")]
    out = asyncio.run(cm.preprocess(msgs))
    assert out == msgs


def test_compactify_over_budget():
    cm = CompactifyContextManager(max_tokens=50, keep_recent=2)
    msgs = [ChatMessage("system", "sys instructions")]
    for i in range(10):
        msgs.append(ChatMessage("user", f"question {i} " + "filler words " * 20))
        msgs.append(ChatMessage("assistant", f"answer {i} " + "more filler " * 20))
    out = asyncio.run(cm.preprocess(msgs))
    assert len(out) < len(msgs)
    assert out[0].role == "system"
    assert "[Conversation summary" in out[1].content
    assert out[-1].content == msgs[-1].content  # recent kept verbatim


def test_compactify_keeps_tool_pairs_together():
    cm = CompactifyContextManager(max_tokens=10, keep_recent=3)
    msgs = [
        ChatMessage("user", "q " * 50),
        ChatMessage("assistant", "calling tool " * 20),
        ChatMessage("tool", "tool result", tool_call_id="c1"),
        ChatMessage("assistant", "final answer"),
    ]
    out = asyncio.run(cm.preprocess(msgs))
    # a tool message must not become the first post-summary message
    roles = [m.role for m in out]
    first_non_summary = roles.index("tool") if "tool" in roles else None
    if first_non_summary is not None:
        assert roles[first_non_summary - 1] in ("assistant", "user")


def test_context_manager_factory():
    assert isinstance(get_context_manager(None), NoOpContextManager)
    cfg = ContextManagerConfig(name="compactify", config={"max_tokens": 123})
    cm = get_context_manager(cfg)
    assert isinstance(cm, CompactifyContextManager) and cm.max_tokens == 123
    with pytest.raises(ValueError):
        get_context_manager(ContextManagerConfig(name="bogus"))


def test_agent_uses_context_manager():
    calls = {"n": 0}

    class Counting(NoOpContextManager):
        async def preprocess(self, messages):
            calls["n"] += 1
            return messages

    client = FakeChatClient(scripted=[FakeChatClient.text_response("done")])
    agent = SimpleAgent(AgentConfig(), client=client)
    agent.context_manager = Counting()
    asyncio.run(agent.run("task"))
    assert calls["n"] == 1


def test_shell_env_tools_and_cleanup(tmp_path):
    env = ShellLocalEnv()
    asyncio.run(env.build())
    tools = env.get_tools()
    names = set()
    for t in tools:
        names.update(t.tools_map)
    assert {"run_bash", "execute_python_code", "read_file"} <= names
    ws = env.workspace
    import os

    assert os.path.exists(ws)
    asyncio.run(env.cleanup())
    assert not os.path.exists(ws)


def test_env_factory_and_agent_integration():
    assert isinstance(get_env(None), BasicEnv)
    cfg = AgentConfig(env=EnvConfig(name="shell_local"))
    client = FakeChatClient(
        scripted=[
            FakeChatClient.tool_response("run_bash", {"command": "echo hello-from-env"}),
            FakeChatClient.text_response("ran"),
        ]
    )
    agent = SimpleAgent(cfg, client=client)
    rec = asyncio.run(agent.run("run echo"))
    assert rec.tool_calls[0].output.strip() == "hello-from-env"
    asyncio.run(agent.cleanup())


def test_browser_env_gated():
    from youtu_rag_tpu.agents.env import BrowserEnv

    env = BrowserEnv()
    with pytest.raises((RuntimeError, NotImplementedError)):
        asyncio.run(env.build())


def test_web_toolkits_gated_errors():
    from youtu_rag_tpu.tools.web import SearchToolkit

    tk = SearchToolkit()
    out = asyncio.run(tk.call_tool("web_search", {"query": "x"}))
    assert "not configured" in out


def test_document_toolkit_without_llm(tmp_path):
    from youtu_rag_tpu.tools.web import DocumentToolkit

    p = tmp_path / "doc.md"
    p.write_text("the answer is 42")
    tk = DocumentToolkit()
    out = asyncio.run(tk.call_tool("document_qa", {"path": str(p), "question": "?"}))
    assert "42" in out
