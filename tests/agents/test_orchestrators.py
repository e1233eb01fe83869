import asyncio
import json

from youtu_rag_tpu.agents.config import AgentConfig
from youtu_rag_tpu.agents.llm import ChatMessage, FakeChatClient
from youtu_rag_tpu.agents.orchestra import OrchestraAgent, parse_plan
from youtu_rag_tpu.agents.orchestrator import (
    OrchestratorAgent,
    ParallelOrchestratorAgent,
    parse_task_list,
)
from youtu_rag_tpu.agents.simple_agent import SimpleAgent
from youtu_rag_tpu.agents.workforce import WorkforceAgent


def _worker(reply: str) -> SimpleAgent:
    return SimpleAgent(
        AgentConfig(), client=FakeChatClient(rule_fn=lambda m, t: FakeChatClient.text_response(reply))
    )


def test_parse_plan_protocol():
    text = (
        "<analysis>split into search and math</analysis>\n"
        '<plan>[\n{"agent_name": "searcher", "task": "find population", "completed": false},\n'
        '{"agent_name": "calculator", "task": "double it", "completed": false}\n]</plan>'
    )
    plan = parse_plan(text)
    assert plan.analysis == "split into search and math"
    assert [t.agent_name for t in plan.todo] == ["searcher", "calculator"]
    assert parse_plan("garbage").todo == []


def test_orchestra_plan_work_report():
    plan_text = (
        "<analysis>two steps</analysis>"
        '<plan>[{"agent_name": "searcher", "task": "look up X", "completed": false},'
        '{"agent_name": "writer", "task": "summarize", "completed": false}]</plan>'
    )

    def rule(messages, tools):
        content = messages[-1].content or ""
        if "task planner" in (messages[0].content or ""):
            return FakeChatClient.text_response(plan_text)
        if "reporter" in content.lower() or "Trajectory:" in content:
            return FakeChatClient.text_response("FINAL REPORT")
        return FakeChatClient.text_response("?")

    agent = OrchestraAgent(
        AgentConfig(type="orchestra"),
        client=FakeChatClient(rule_fn=rule),
        workers={"searcher": _worker("X is 42"), "writer": _worker("Summary: 42")},
    )
    rec = asyncio.run(agent.run("what is X?"))
    assert rec.final_output == "FINAL REPORT"
    # both workers ran, in order, with context propagation
    roles = [t.get("role") for t in rec.trajectory]
    assert "searcher" in roles and "writer" in roles


def test_orchestra_events_stream():
    plan_text = '<analysis>a</analysis><plan>[{"agent_name": "w", "task": "t", "completed": false}]</plan>'

    def rule(messages, tools):
        if "task planner" in (messages[0].content or ""):
            return FakeChatClient.text_response(plan_text)
        return FakeChatClient.text_response("done")

    agent = OrchestraAgent(
        AgentConfig(type="orchestra"), client=FakeChatClient(rule_fn=rule), workers={"w": _worker("ok")}
    )

    async def collect():
        rec = agent.run_streamed("q")
        evs = [e.type async for e in rec.stream_events()]
        await rec.wait()
        return evs

    evs = asyncio.run(collect())
    assert "plan" in evs and "agent_switch" in evs and "report" in evs and evs[-1] == "final"


def test_orchestra_workflow_updates():
    """The stream carries in-place workflow snapshots: pending → running →
    done per node (ref workflow_update visualization events)."""
    plan_text = (
        '<analysis>a</analysis><plan>[{"agent_name": "w1", "task": "t1", "completed": false},'
        '{"agent_name": "w2", "task": "t2", "completed": false}]</plan>'
    )

    def rule(messages, tools):
        if "task planner" in (messages[0].content or ""):
            return FakeChatClient.text_response(plan_text)
        return FakeChatClient.text_response("done")

    agent = OrchestraAgent(
        AgentConfig(type="orchestra"), client=FakeChatClient(rule_fn=rule),
        workers={"w1": _worker("r1"), "w2": _worker("r2")},
    )

    async def collect():
        rec = agent.run_streamed("q")
        evs = [e async for e in rec.stream_events()]
        await rec.wait()
        return evs

    evs = asyncio.run(collect())
    wfs = [e.data["nodes"] for e in evs if e.type == "workflow_update"]
    assert len(wfs) >= 5  # initial + (running, done) per node
    assert [n["status"] for n in wfs[0]] == ["pending", "pending"]
    assert any([n["status"] for n in w] == ["running", "pending"] for w in wfs)
    assert any([n["status"] for n in w] == ["done", "running"] for w in wfs)
    assert [n["status"] for n in wfs[-1]] == ["done", "done"]
    assert wfs[0][0]["agent"] == "w1" and wfs[0][1]["task"] == "t2"


def test_chain_orchestrator_sequential_context():
    seen_prompts = []

    class Recorder(FakeChatClient):
        pass

    def worker_rule(msgs, tools):
        prompt = next(m.content for m in reversed(msgs) if m.role == "user")
        seen_prompts.append(prompt)
        return FakeChatClient.text_response(f"result-of[{prompt[-20:]}]")

    workers = {
        "a": SimpleAgent(AgentConfig(), client=FakeChatClient(rule_fn=worker_rule)),
        "b": SimpleAgent(AgentConfig(), client=FakeChatClient(rule_fn=worker_rule)),
    }

    def router_rule(msgs, tools):
        return FakeChatClient.text_response(
            '[{"agent_name": "a", "task": "step one"}, {"agent_name": "b", "task": "step two"}]'
        )

    agent = OrchestratorAgent(
        AgentConfig(type="orchestrator"), client=FakeChatClient(rule_fn=router_rule), workers=workers
    )
    rec = asyncio.run(agent.run("do the thing"))
    assert rec.final_output.startswith("result-of")
    # second worker saw the first worker's result in context
    assert "Result of step 1" in seen_prompts[1]


def test_chain_orchestrator_chitchat_path():
    def router_rule(msgs, tools):
        if "orchestrator routing" in (msgs[0].content or ""):
            return FakeChatClient.text_response('[{"agent_name": "chitchat", "task": "hi"}]')
        return FakeChatClient.text_response("hello there!")

    agent = OrchestratorAgent(
        AgentConfig(type="orchestrator"), client=FakeChatClient(rule_fn=router_rule), workers={}
    )
    rec = asyncio.run(agent.run("hi"))
    assert rec.final_output == "hello there!"


def test_parallel_orchestrator_merges():
    def router_rule(msgs, tools):
        content = msgs[-1].content or ""
        if "INDEPENDENT" in (msgs[0].content or ""):
            return FakeChatClient.text_response(
                '[{"agent_name": "a", "task": "part 1"}, {"agent_name": "b", "task": "part 2"}]'
            )
        if content.startswith("Merge the results"):
            return FakeChatClient.text_response("MERGED")
        return FakeChatClient.text_response("?")

    agent = ParallelOrchestratorAgent(
        AgentConfig(type="parallel_orchestrator", max_parallel=2),
        client=FakeChatClient(rule_fn=router_rule),
        workers={"a": _worker("alpha"), "b": _worker("beta")},
    )
    rec = asyncio.run(agent.run("big question"))
    assert rec.final_output == "MERGED"
    assert {t.get("role") for t in rec.trajectory if t.get("role") in ("a", "b")} == {"a", "b"}


def test_parallel_orchestrator_timeout():
    class SlowClient(FakeChatClient):
        async def chat(self, messages, tools=None, **kw):
            await asyncio.sleep(1.0)
            return FakeChatClient.text_response("late")

    def router_rule(msgs, tools):
        if "INDEPENDENT" in (msgs[0].content or ""):
            return FakeChatClient.text_response('[{"agent_name": "slow", "task": "x"}]')
        return FakeChatClient.text_response("merged anyway")

    slow_worker = SimpleAgent(AgentConfig(), client=SlowClient())
    agent = ParallelOrchestratorAgent(
        AgentConfig(type="parallel_orchestrator", task_timeout=0.05),
        client=FakeChatClient(rule_fn=router_rule),
        workers={"slow": slow_worker},
    )
    rec = asyncio.run(agent.run("q"))
    assert rec.final_output == "merged anyway"
    assert any("timed out" in (t.get("content") or "") for t in rec.trajectory)


def test_parse_parallel_plan_groups_and_flat():
    from youtu_rag_tpu.agents.orchestrator import parse_parallel_plan

    groups = parse_parallel_plan(
        '{"groups": [[{"agent_name": "a", "task": "t1"}, {"agent_name": "b", "task": "t2"}],'
        ' [{"agent_name": "c", "task": "t3"}]]}'
    )
    assert [len(g) for g in groups] == [2, 1]
    assert groups[1][0].agent_name == "c"
    # flat list → one group
    flat = parse_parallel_plan('[{"agent_name": "a", "task": "t"}]')
    assert len(flat) == 1 and len(flat[0]) == 1
    assert parse_parallel_plan("garbage") == []
    assert parse_parallel_plan('{"groups": []}') == []


def test_parallel_orchestrator_grouped_streaming():
    """Grouped execution: group 2 sees group 1 results, and the stream
    carries the full window protocol (parallel_group / parallel_task /
    tagged worker events / merge)."""
    seen_prompts = []

    def worker_rule(msgs, tools):
        prompt = next(m.content for m in reversed(msgs) if m.role == "user")
        seen_prompts.append(prompt)
        return FakeChatClient.text_response(f"res[{prompt[:12]}]")

    workers = {
        "a": SimpleAgent(AgentConfig(), client=FakeChatClient(rule_fn=worker_rule)),
        "b": SimpleAgent(AgentConfig(), client=FakeChatClient(rule_fn=worker_rule)),
        "c": SimpleAgent(AgentConfig(), client=FakeChatClient(rule_fn=worker_rule)),
    }

    def router_rule(msgs, tools):
        content = msgs[-1].content or ""
        if "INDEPENDENT" in (msgs[0].content or ""):
            return FakeChatClient.text_response(
                '{"groups": [[{"agent_name": "a", "task": "part 1"},'
                ' {"agent_name": "b", "task": "part 2"}],'
                ' [{"agent_name": "c", "task": "combine"}]]}'
            )
        if content.startswith("Merge the results"):
            return FakeChatClient.text_response("MERGED")
        return FakeChatClient.text_response("?")

    agent = ParallelOrchestratorAgent(
        AgentConfig(type="parallel_orchestrator", max_parallel=2),
        client=FakeChatClient(rule_fn=router_rule),
        workers=workers,
    )

    async def collect():
        rec = agent.run_streamed("big question")
        evs = [e async for e in rec.stream_events()]
        await rec.wait()
        return rec, evs

    rec, evs = asyncio.run(collect())
    assert rec.final_output == "MERGED"
    # the second group's worker saw the first group's results in context
    assert any("Result of earlier task" in p and "Your task: combine" in p for p in seen_prompts)

    types = [(e.type, e.data.get("status")) for e in evs if e.type in ("parallel_group", "parallel_task", "merge")]
    assert types.count(("parallel_group", "start")) == 2
    assert types.count(("parallel_group", "done")) == 2
    assert types.count(("parallel_task", "start")) == 3
    assert types.count(("parallel_task", "done")) == 3
    assert ("merge", "start") in types and ("merge", "done") in types
    # group 1's done precedes group 2's start (sequential groups)
    g_evs = [e.data for e in evs if e.type == "parallel_group"]
    assert [(d["group"], d["status"]) for d in g_evs] == [
        (0, "start"), (0, "done"), (1, "start"), (1, "done")]
    # worker sub-events are forwarded tagged for window routing
    tagged = [e for e in evs if e.data.get("parallel_agent")]
    assert tagged and all(e.type not in ("final", "error", "done") for e in tagged)
    # task done cards carry the result + timing
    dones = [e for e in evs if e.type == "parallel_task" and e.data["status"] == "done"]
    assert all("res[" in d.data["result"] and "duration_ms" in d.data for d in dones)


def test_parallel_orchestrator_timeout_emits_task_card():
    class SlowClient(FakeChatClient):
        async def chat(self, messages, tools=None, **kw):
            await asyncio.sleep(1.0)
            return FakeChatClient.text_response("late")

    def router_rule(msgs, tools):
        if "INDEPENDENT" in (msgs[0].content or ""):
            return FakeChatClient.text_response('[{"agent_name": "slow", "task": "x"}]')
        return FakeChatClient.text_response("merged anyway")

    agent = ParallelOrchestratorAgent(
        AgentConfig(type="parallel_orchestrator", task_timeout=0.05),
        client=FakeChatClient(rule_fn=router_rule),
        workers={"slow": SimpleAgent(AgentConfig(), client=SlowClient())},
    )

    async def collect():
        rec = agent.run_streamed("q")
        evs = [e async for e in rec.stream_events()]
        await rec.wait()
        return rec, evs

    rec, evs = asyncio.run(collect())
    assert rec.final_output == "merged anyway"
    cards = [e.data for e in evs if e.type == "parallel_task"]
    assert cards[-1]["status"] == "timeout" and "timed out" in cards[-1]["error"]


def test_workforce_full_loop():
    calls = {"check": 0}

    def rule(msgs, tools):
        content = msgs[-1].content or ""
        system = msgs[0].content or ""
        if "project planner" in system:
            return FakeChatClient.text_response('["research topic", "write summary"]')
        if content.startswith("Pick the best executor"):
            name = "researcher" if "Task: research" in content else "writer"
            return FakeChatClient.text_response(
                json.dumps({"executor": name, "instruction": "do it"})
            )
        if content.startswith("You are reviewing plan progress"):
            calls["check"] += 1
            return FakeChatClient.text_response('{"action": "continue"}')
        if content.startswith("Extract the final answer"):
            return FakeChatClient.text_response("WORKFORCE ANSWER")
        return FakeChatClient.text_response("?")

    agent = WorkforceAgent(
        AgentConfig(type="workforce"),
        client=FakeChatClient(rule_fn=rule),
        executors={"researcher": _worker("facts found"), "writer": _worker("summary written")},
    )
    rec = asyncio.run(agent.run("research and summarize"))
    assert rec.final_output == "WORKFORCE ANSWER"
    assert calls["check"] == 2
    executors = [t.get("role") for t in rec.trajectory if t.get("role") in ("researcher", "writer")]
    assert executors == ["researcher", "writer"]


def test_workforce_workflow_updates():
    def rule(msgs, tools):
        content = msgs[-1].content or ""
        system = msgs[0].content or ""
        if "project planner" in system:
            return FakeChatClient.text_response('["t1", "t2"]')
        if content.startswith("Pick the best executor"):
            return FakeChatClient.text_response('{"executor": "e", "instruction": "go"}')
        if content.startswith("You are reviewing plan progress"):
            return FakeChatClient.text_response('{"action": "continue"}')
        if content.startswith("Extract the final answer"):
            return FakeChatClient.text_response("A")
        return FakeChatClient.text_response("?")

    agent = WorkforceAgent(
        AgentConfig(type="workforce"), client=FakeChatClient(rule_fn=rule),
        executors={"e": _worker("ok")},
    )

    async def collect():
        rec = agent.run_streamed("q")
        evs = [e async for e in rec.stream_events()]
        await rec.wait()
        return evs

    evs = asyncio.run(collect())
    wfs = [e.data["nodes"] for e in evs if e.type == "workflow_update"]
    assert [n["status"] for n in wfs[0]] == ["pending", "pending"]
    assert any([n["status"] for n in w] == ["running", "pending"] for w in wfs)
    assert [n["status"] for n in wfs[-1]] == ["done", "done"]


def test_workforce_early_finish():
    def rule(msgs, tools):
        content = msgs[-1].content or ""
        system = msgs[0].content or ""
        if "project planner" in system:
            return FakeChatClient.text_response('["t1", "t2", "t3"]')
        if content.startswith("Pick the best executor"):
            return FakeChatClient.text_response('{"executor": "e", "instruction": "go"}')
        if content.startswith("You are reviewing plan progress"):
            return FakeChatClient.text_response('{"action": "finish"}')
        if content.startswith("Extract the final answer"):
            return FakeChatClient.text_response("EARLY")
        return FakeChatClient.text_response("?")

    agent = WorkforceAgent(
        AgentConfig(type="workforce"), client=FakeChatClient(rule_fn=rule), executors={"e": _worker("ok")}
    )
    rec = asyncio.run(agent.run("q"))
    assert rec.final_output == "EARLY"
    # finished after the first task despite 3 planned
    assert len([t for t in rec.trajectory if t.get("role") == "e"]) == 1


def test_factory_builds_orchestrators():
    from youtu_rag_tpu.agents.factory import get_agent

    c = FakeChatClient()
    assert isinstance(get_agent({"type": "orchestra"}, client=c), OrchestraAgent)
    assert isinstance(get_agent({"type": "orchestrator"}, client=c), OrchestratorAgent)
    assert isinstance(
        get_agent({"type": "parallel_orchestrator"}, client=c), ParallelOrchestratorAgent
    )
    assert isinstance(get_agent({"type": "workforce"}, client=c), WorkforceAgent)


def test_parse_task_list_robust():
    assert parse_task_list("no json here") == []
    ts = parse_task_list('prefix [{"agent_name": "a", "task": "t"}] suffix')
    assert ts[0].agent_name == "a"


def test_planner_examples_rendered():
    from youtu_rag_tpu.agents.orchestra import load_planner_examples

    text = load_planner_examples()
    assert "Q3 revenue" in text and "<plan>[" in text

    seen = {}

    def rule(messages, tools):
        if "task planner" in (messages[0].content or ""):
            seen["prompt"] = messages[0].content
            return FakeChatClient.text_response(
                '<analysis>a</analysis><plan>[{"agent_name": "w", "task": "t", "completed": false}]</plan>'
            )
        return FakeChatClient.text_response("done")

    agent = OrchestraAgent(
        AgentConfig(type="orchestra"), client=FakeChatClient(rule_fn=rule), workers={"w": _worker("ok")}
    )
    asyncio.run(agent.run("q"))
    assert "Examples:" in seen["prompt"]

    # examples can be disabled via planner_config
    cfg = AgentConfig(type="orchestra", planner_config={"use_examples": False})
    agent2 = OrchestraAgent(cfg, client=FakeChatClient(rule_fn=rule), workers={"w": _worker("ok")})
    asyncio.run(agent2.run("q"))
    assert "Examples:" not in seen["prompt"]
