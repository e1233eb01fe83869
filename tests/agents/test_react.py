import asyncio
import json

from youtu_rag_tpu.agents.config import AgentConfig
from youtu_rag_tpu.agents.llm import ChatMessage, FakeChatClient
from youtu_rag_tpu.agents.react import ReactChatClient, parse_react, render_tools
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


def test_parse_action():
    thought, calls, final = parse_react(
        'Thought: I should add.\nAction: add\nAction Input: {"a": 1, "b": 2}\n'
    )
    assert thought == "I should add."
    assert calls[0].name == "add" and calls[0].parsed_arguments() == {"a": 1, "b": 2}
    assert final is None


def test_parse_final():
    thought, calls, final = parse_react("Thought: done\nFinal Answer: 42")
    assert final == "42" and not calls


def test_parse_bad_json_degrades():
    _, calls, final = parse_react("Action: add\nAction Input: {broken")
    assert not calls and final is not None


def test_render_tools():
    tk = CalcToolkit()
    text = render_tools(tk.get_tools_in_openai())
    assert "add(a: integer, b: integer)" in text


def test_react_loop_end_to_end():
    """A text-only model drives the standard SimpleAgent tool loop through
    the ReAct adapter."""
    turns = {"n": 0}

    def rule(messages, tools):
        assert tools is None  # inner model never sees function schemas
        sys = messages[0].content
        assert "Action Input" in sys  # tools rendered into the prompt
        turns["n"] += 1
        if turns["n"] == 1:
            return FakeChatClient.text_response(
                'Thought: need math\nAction: add\nAction Input: {"a": 40, "b": 2}'
            )
        # the observation came back as a user turn
        last = messages[-1].content
        assert last.startswith("Observation: 42")
        return FakeChatClient.text_response("Thought: got it\nFinal Answer: the sum is 42")

    inner = FakeChatClient(rule_fn=rule)
    agent = SimpleAgent(AgentConfig(), client=ReactChatClient(inner), toolkits=[CalcToolkit()])
    rec = asyncio.run(agent.run("what is 40+2?"))
    assert rec.final_output == "the sum is 42"
    assert rec.tool_calls[0].name == "add" and rec.tool_calls[0].output == "42"


def test_react_passthrough_without_tools():
    inner = FakeChatClient(scripted=[FakeChatClient.text_response("plain")])
    client = ReactChatClient(inner)
    resp = asyncio.run(client.chat([ChatMessage("user", "hi")]))
    assert resp.message.content == "plain"
