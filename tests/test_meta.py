import asyncio

import pytest

from youtu_rag_tpu.agents.llm import FakeChatClient
from youtu_rag_tpu.agents.llm_agent import LLMAgent
from youtu_rag_tpu.meta.generators import SimpleAgentGenerator, ToolGenerator

GOOD_AGENT_YAML = """type: simple
agent:
  name: kb_helper
  instructions: Search the knowledge base before answering.
toolkits:
  kb_search:
    mode: builtin
max_turns: 20
"""

GOOD_TOOL_SOURCE = '''
from youtu_rag_tpu.tools.base import AsyncBaseToolkit, register_tool


class WordCountToolkit(AsyncBaseToolkit):
    @register_tool
    async def count_words(self, text: str) -> str:
        """Count the words in a text.

        Args:
            text: The text to count.
        """
        return str(len(text.split()))
'''


def test_agent_generator_happy_path():
    llm = LLMAgent(client=FakeChatClient(scripted=[FakeChatClient.text_response(GOOD_AGENT_YAML)]))
    gen = SimpleAgentGenerator(llm)
    cfg = asyncio.run(gen.generate("a kb helper"))
    assert cfg.agent.name == "kb_helper"
    assert "kb_search" in cfg.toolkits and cfg.max_turns == 20


def test_agent_generator_retries_on_invalid():
    llm = LLMAgent(
        client=FakeChatClient(
            scripted=[
                FakeChatClient.text_response("type: [broken yaml"),
                FakeChatClient.text_response(GOOD_AGENT_YAML),
            ]
        )
    )
    gen = SimpleAgentGenerator(llm)
    cfg = asyncio.run(gen.generate("a kb helper"))
    assert cfg.agent.name == "kb_helper"


def test_agent_generator_to_file(tmp_path):
    llm = LLMAgent(client=FakeChatClient(scripted=[FakeChatClient.text_response(GOOD_AGENT_YAML)]))
    gen = SimpleAgentGenerator(llm)
    out = tmp_path / "agent.yaml"
    asyncio.run(gen.generate_to_file("x", out))
    from youtu_rag_tpu.core.loader import ConfigLoader

    loaded = ConfigLoader(tmp_path).load_agent_config(str(out.name))
    assert loaded.agent.name == "kb_helper"


def test_tool_generator_validates_and_retries():
    llm = LLMAgent(
        client=FakeChatClient(
            scripted=[
                FakeChatClient.text_response("def not_a_toolkit(): pass"),
                FakeChatClient.text_response(GOOD_TOOL_SOURCE),
            ]
        )
    )
    gen = ToolGenerator(llm)
    source, cls = asyncio.run(gen.generate("word counting"))
    inst = cls()
    assert asyncio.run(inst.call_tool("count_words", {"text": "a b c"})) == "3"


def test_tool_generator_gives_up():
    llm = LLMAgent(
        client=FakeChatClient(rule_fn=lambda m, t: FakeChatClient.text_response("import nothing_useful"))
    )
    gen = ToolGenerator(llm, max_retries=1)
    with pytest.raises(ValueError, match="tool generation failed"):
        asyncio.run(gen.generate("x"))


BROKEN_AT_CALL_SOURCE = '''
from youtu_rag_tpu.tools.base import AsyncBaseToolkit, register_tool


class MathToolkit(AsyncBaseToolkit):
    @register_tool
    async def divide(self, a: float, b: float) -> str:
        """Divide a by b.

        Args:
            a: Numerator.
            b: Denominator.
        """
        return str(a / undefined_total)  # NameError at CALL time only
'''

FIXED_AT_CALL_SOURCE = BROKEN_AT_CALL_SOURCE.replace(
    "return str(a / undefined_total)  # NameError at CALL time only",
    "return str(a / b) if b else 'undefined'",
)


def test_tool_debugger_repairs_runtime_failure_within_two_rounds():
    """VERDICT r3 item 10: a toolkit that imports cleanly but crashes when
    called must be repaired by the call-with-sample-args traceback loop."""
    from youtu_rag_tpu.meta.generators import ToolDebugger

    calls = {"gen": 0, "fix": 0}

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("Write a Python toolkit"):
            calls["gen"] += 1
            return FakeChatClient.text_response(BROKEN_AT_CALL_SOURCE)
        if content.startswith("Your generated toolkit imports cleanly but CRASHES"):
            calls["fix"] += 1
            assert "NameError" in content or "undefined_total" in content
            return FakeChatClient.text_response(FIXED_AT_CALL_SOURCE)
        if content.startswith("Propose realistic sample arguments"):
            return FakeChatClient.text_response('{"a": 6, "b": 3}')
        return FakeChatClient.text_response("?")

    dbg = ToolDebugger(LLMAgent(client=FakeChatClient(rule_fn=rule)), max_rounds=2)
    source, cls, report = asyncio.run(dbg.debug("a division tool"))
    assert calls["fix"] == 1 and report["rounds"] == 1
    inst = cls()
    assert asyncio.run(inst.call_tool("divide", {"a": 6, "b": 3})) == "2.0"
    assert "undefined_total" not in source


def test_tool_debugger_gives_up_after_max_rounds():
    from youtu_rag_tpu.meta.generators import ToolDebugger

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("Write a Python toolkit") or content.startswith(
            "Your generated toolkit imports cleanly but CRASHES"
        ):
            return FakeChatClient.text_response(BROKEN_AT_CALL_SOURCE)
        if content.startswith("Propose realistic sample arguments"):
            return FakeChatClient.text_response('{"a": 1, "b": 2}')
        return FakeChatClient.text_response("?")

    dbg = ToolDebugger(LLMAgent(client=FakeChatClient(rule_fn=rule)), max_rounds=1)
    with pytest.raises(ValueError, match="still failing"):
        asyncio.run(dbg.debug("a division tool"))


def test_tool_debugger_schema_fallback_args():
    from youtu_rag_tpu.meta.generators import ToolDebugger

    schema = {
        "name": "t",
        "parameters": {
            "properties": {
                "q": {"type": "string"},
                "n": {"type": "integer"},
                "mode": {"type": "string", "enum": ["fast", "slow"]},
            },
            "required": ["q", "n", "mode"],
        },
    }
    args = ToolDebugger._sample_from_schema(schema)
    assert args == {"q": "sample", "n": 1, "mode": "fast"}
