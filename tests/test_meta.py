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
