"""Regression pins for the agents/memory review findings."""

import asyncio
import json

from youtu_rag_tpu.agents.react import parse_react
from youtu_rag_tpu.memory.toolkit import VectorMemoryToolkit


def test_react_parses_pretty_printed_nested_json():
    text = (
        "Thought: search the kb\n"
        "Action: kb_search\n"
        'Action Input: {\n  "query": "x",\n  "opts": {"top_k": 3}\n}\n'
    )
    thought, calls, final = parse_react(text)
    assert final is None  # used to degrade to raw transcript
    assert calls and calls[0].name == "kb_search"
    assert json.loads(calls[0].arguments) == {"query": "x", "opts": {"top_k": 3}}


def test_react_json_with_brace_in_string():
    text = 'Action: t\nAction Input: {"s": "a } b", "n": 1}'
    _, calls, final = parse_react(text)
    assert final is None and json.loads(calls[0].arguments)["s"] == "a } b"


def test_memory_persistence_round_trip(tmp_path):
    p = str(tmp_path / "mem.json")

    async def go():
        tk = VectorMemoryToolkit({"user_id": "u", "persist_path": p})
        await tk.build()
        await tk.add_memory("the sky is blue", memory_type="semantic")
        await tk.store_skill("greet", "say hello", ["wave", "speak"])
        await tk.store_conversation("hi", "hello there")
        # new toolkit, same path: build() must restore (persist_path was
        # previously write-only)
        tk2 = VectorMemoryToolkit({"user_id": "u", "persist_path": p})
        await tk2.build()
        found = await tk2.search_memory("sky color")
        skills = await tk2.search_skills("greeting")
        return found, skills

    found, skills = asyncio.run(go())
    assert "sky is blue" in found
    assert "greet" in skills


def test_orchestrators_expose_run_task_and_cleanup():
    from youtu_rag_tpu.agents.orchestra import OrchestraAgent
    from youtu_rag_tpu.agents.orchestrator import OrchestratorAgent, ParallelOrchestratorAgent
    from youtu_rag_tpu.agents.workforce import WorkforceAgent

    for cls in (OrchestraAgent, OrchestratorAgent, ParallelOrchestratorAgent, WorkforceAgent):
        assert hasattr(cls, "cleanup"), cls.__name__
