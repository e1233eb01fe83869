import asyncio
import json

import pytest

from youtu_rag_tpu.agents.config import AgentConfig
from youtu_rag_tpu.agents.llm import ChatMessage, FakeChatClient
from youtu_rag_tpu.agents.simple_agent import SimpleAgent
from youtu_rag_tpu.tools.base import AsyncBaseToolkit, register_tool


class CalcToolkit(AsyncBaseToolkit):
    @register_tool
    async def add(self, a: int, b: int) -> str:
        """Add two numbers.

        Args:
            a: First number.
            b: Second number.
        """
        return str(a + b)


def test_plain_answer():
    client = FakeChatClient(scripted=[FakeChatClient.text_response("the answer")])
    agent = SimpleAgent(AgentConfig(), client=client)
    rec = asyncio.run(agent.run("question?"))
    assert rec.final_output == "the answer"
    assert rec.trajectory[0] == {"role": "user", "content": "question?"}


def test_tool_loop():
    client = FakeChatClient(
        scripted=[
            FakeChatClient.tool_response("add", {"a": 2, "b": 40}),
            FakeChatClient.text_response("The sum is 42."),
        ]
    )
    agent = SimpleAgent(AgentConfig(), client=client, toolkits=[CalcToolkit()])
    rec = asyncio.run(agent.run("what is 2+40?"))
    assert rec.final_output == "The sum is 42."
    assert rec.tool_calls[0].name == "add"
    assert rec.tool_calls[0].output == "42"
    # the tool result was fed back to the model
    last_call = client.calls[-1]
    tool_msgs = [m for m in last_call["messages"] if m.role == "tool"]
    assert tool_msgs and tool_msgs[0].content == "42"
    # tools were advertised with schemas
    assert client.calls[0]["tools"][0]["function"]["name"] == "add"


def test_streaming_events():
    client = FakeChatClient(
        scripted=[
            FakeChatClient.tool_response("add", {"a": 1, "b": 1}),
            FakeChatClient.text_response("2"),
        ]
    )
    agent = SimpleAgent(AgentConfig(), client=client, toolkits=[CalcToolkit()])

    async def collect():
        rec = agent.run_streamed("1+1?")
        events = [e async for e in rec.stream_events()]
        await rec.wait()
        return events, rec

    events, rec = asyncio.run(collect())
    types = [e.type for e in events]
    assert "tool_call" in types and "tool_output" in types and types[-1] == "final"
    assert rec.final_output == "2"


def test_max_turns_cap():
    client = FakeChatClient(
        rule_fn=lambda msgs, tools: FakeChatClient.tool_response("add", {"a": 1, "b": 1})
    )
    cfg = AgentConfig(max_turns=3)
    agent = SimpleAgent(cfg, client=client, toolkits=[CalcToolkit()])
    rec = asyncio.run(agent.run("loop forever"))
    assert "max turns" in rec.final_output
    assert len(rec.tool_calls) == 3


def test_chat_keeps_history():
    responses = [
        FakeChatClient.text_response("first"),
        FakeChatClient.text_response("second"),
    ]
    client = FakeChatClient(scripted=responses)
    agent = SimpleAgent(AgentConfig(), client=client)
    asyncio.run(agent.chat("hello"))
    asyncio.run(agent.chat("again"))
    msgs = client.calls[-1]["messages"]
    contents = [m.content for m in msgs if m.role in ("user", "assistant")]
    assert contents == ["hello", "first", "again"]


def test_error_surfaces():
    class Boom(FakeChatClient):
        async def chat(self, messages, tools=None, **kw):
            raise RuntimeError("llm down")

    agent = SimpleAgent(AgentConfig(), client=Boom())
    with pytest.raises(RuntimeError, match="llm down"):
        asyncio.run(agent.run("hi"))


def test_memory_roundtrip():
    from youtu_rag_tpu.memory.toolkit import VectorMemoryToolkit

    mem = VectorMemoryToolkit({"user_id": "u1"})
    client = FakeChatClient(scripted=[
        FakeChatClient.text_response("noted: project alpha deadline friday"),
        FakeChatClient.text_response("deadline is friday"),
    ])
    cfg = AgentConfig()
    cfg.memory.enabled = True
    agent = SimpleAgent(cfg, client=client, memory_toolkit=mem)
    asyncio.run(agent.run("remember: project alpha deadline is friday"))
    # second run should see memory context injected into the system prompt
    asyncio.run(agent.run("when is the project alpha deadline?"))
    sys_msg = client.calls[-1]["messages"][0]
    assert sys_msg.role == "system"
    assert "Relevant memory" in sys_msg.content
    assert "alpha" in sys_msg.content.lower()


def test_trajectory_sink():
    sunk = []

    async def sink(record):
        sunk.append(record)

    client = FakeChatClient(scripted=[FakeChatClient.text_response("done")])
    agent = SimpleAgent(AgentConfig(), client=client, trajectory_sink=sink)
    asyncio.run(agent.run("task"))
    assert sunk and sunk[0]["output"] == "done"


def test_llm_agent():
    from youtu_rag_tpu.agents.llm_agent import LLMAgent

    a = LLMAgent(instructions="You judge.", client=FakeChatClient())
    out = asyncio.run(a.run("judge this"))
    assert out == "echo: judge this"


def test_factory_dispatch():
    from youtu_rag_tpu.agents.factory import get_agent
    from youtu_rag_tpu.agents.llm_agent import LLMAgent

    assert isinstance(get_agent({"type": "simple"}, client=FakeChatClient()), SimpleAgent)
    assert isinstance(get_agent({"type": "llm"}, client=FakeChatClient()), LLMAgent)


def test_run_hooks_fire_and_are_fault_isolated():
    from youtu_rag_tpu.agents.hooks import BaseRunHooks

    events = []

    class Recording(BaseRunHooks):
        async def on_agent_start(self, agent, task):
            events.append(("start", task))

        async def on_tool_start(self, agent, name, arguments):
            events.append(("tool_start", name))

        async def on_tool_end(self, agent, name, result):
            events.append(("tool_end", result))
            raise RuntimeError("hook bug must not break the run")

        async def on_agent_end(self, agent, output):
            events.append(("end", output))

    client = FakeChatClient(
        scripted=[
            FakeChatClient.tool_response("add", {"a": 1, "b": 2}),
            FakeChatClient.text_response("3"),
        ]
    )
    agent = SimpleAgent(AgentConfig(), client=client, toolkits=[CalcToolkit()], hooks=Recording())
    rec = asyncio.run(agent.run("1+2?"))
    assert rec.final_output == "3"
    kinds = [e[0] for e in events]
    assert kinds == ["start", "tool_start", "tool_end", "end"]
    assert events[2][1] == "3"


def test_incremental_stream_deltas():
    """A streaming-capable client's token deltas surface as incremental
    recorder events (not one buffered chunk)."""
    from youtu_rag_tpu.agents.llm import BaseChatClient, ChatMessage as CM, ChatResponse, StreamDelta

    class Chunky(BaseChatClient):
        async def chat(self, messages, tools=None, **kw):
            return ChatResponse(CM("assistant", "hello world"))

        async def stream_chat(self, messages, tools=None, **kw):
            for word in ("hello", " world"):
                yield StreamDelta("text_delta", text=word)
            yield StreamDelta("done", response=ChatResponse(CM("assistant", "hello world")))

    agent = SimpleAgent(AgentConfig(), client=Chunky())

    async def collect():
        rec = agent.run_streamed("hi")
        deltas = [e.text async for e in rec.stream_events() if e.type == "text_delta"]
        await rec.wait()
        return deltas, rec

    deltas, rec = asyncio.run(collect())
    assert deltas == ["hello", " world"]
    assert rec.final_output == "hello world"


def test_sequential_tool_calls_knob():
    order = []

    class OrderedToolkit(AsyncBaseToolkit):
        @register_tool
        async def slow(self, tag: str) -> str:
            """Record execution order.

            Args:
                tag: Identifier for the call.
            """
            order.append(f"start-{tag}")
            await asyncio.sleep(0.02)
            order.append(f"end-{tag}")
            return tag

    from youtu_rag_tpu.agents.llm import ChatResponse, ToolCall

    resp = ChatResponse(
        ChatMessage(
            role="assistant",
            tool_calls=[
                ToolCall("c1", "slow", '{"tag": "a"}'),
                ToolCall("c2", "slow", '{"tag": "b"}'),
            ],
        ),
        finish_reason="tool_calls",
    )
    cfg = AgentConfig()
    cfg.model.parallel_tool_calls = False
    client = FakeChatClient(scripted=[resp, FakeChatClient.text_response("done")])
    agent = SimpleAgent(cfg, client=client, toolkits=[OrderedToolkit()])
    asyncio.run(agent.run("go"))
    assert order == ["start-a", "end-a", "start-b", "end-b"]  # no interleaving
