import asyncio
import json

import pandas as pd
import pytest

from youtu_rag_tpu.agents.llm import FakeChatClient
from youtu_rag_tpu.integrations.dtr.excel_agent import ExcelAgent


@pytest.fixture
def sales_csv(tmp_path):
    df = pd.DataFrame(
        {
            "region": ["north", "south", "north", "east", "south", "north"],
            "revenue": [100, 80, 120, 60, 90, 110],
        }
    )
    p = tmp_path / "sales.csv"
    df.to_csv(p, index=False)
    return str(p)


def _client(good_code: str, retry_first: bool = False):
    state = {"code_calls": 0}

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You are a data analyst planning"):
            return FakeChatClient.text_response('["sum revenue per region"]')
        if content.startswith("Write pandas code"):
            state["code_calls"] += 1
            if retry_first and state["code_calls"] == 1:
                return FakeChatClient.text_response("print(undefined_variable)")
            return FakeChatClient.text_response(f"```python\n{good_code}\n```")
        if content.startswith("Did this step execution succeed"):
            ok = "Error" not in content and "330" in content
            return FakeChatClient.text_response(json.dumps({"success": ok, "reason": "check"}))
        if content.startswith("Answer the question"):
            return FakeChatClient.text_response("North leads with total revenue 330.")
        return FakeChatClient.text_response("?")

    return FakeChatClient(rule_fn=rule), state


GOOD_CODE = "g = dfs['Sheet1'].groupby('region')['revenue'].sum()\nprint(g.to_dict())"


def test_excel_agent_end_to_end(sales_csv):
    client, _ = _client(GOOD_CODE)
    agent = ExcelAgent(client=client)
    rec = asyncio.run(agent.run("which region has the most revenue?", sales_csv))
    assert "330" in rec.final_output


def test_excel_agent_code_retry(sales_csv):
    client, state = _client(GOOD_CODE, retry_first=True)
    agent = ExcelAgent(client=client)
    rec = asyncio.run(agent.run("which region has the most revenue?", sales_csv))
    assert state["code_calls"] == 2  # failing code retried with the error
    assert "330" in rec.final_output


def test_excel_agent_events(sales_csv):
    client, _ = _client(GOOD_CODE)
    agent = ExcelAgent(client=client)

    async def collect():
        rec = agent.run_streamed("q", sales_csv)
        evs = [e.type async for e in rec.stream_events()]
        await rec.wait()
        return evs

    evs = asyncio.run(collect())
    assert "plan" in evs and "tool_call" in evs and "tool_output" in evs and evs[-1] == "final"


def test_excel_agent_missing_file():
    agent = ExcelAgent(client=FakeChatClient())
    with pytest.raises(RuntimeError, match="spreadsheet not found"):
        asyncio.run(agent.run("q", "/nope/missing.xlsx"))


def test_schema_brief(sales_csv):
    schema = ExcelAgent.load_schema(sales_csv)
    assert "Sheet1" in schema and "region" in schema and "6 rows" in schema


def test_excel_agent_experience_manager(sales_csv):
    from youtu_rag_tpu.memory.toolkit import VectorMemoryToolkit

    mem = VectorMemoryToolkit({"user_id": "dtr"})
    client, _ = _client(GOOD_CODE)
    agent = ExcelAgent(client=client, memory_toolkit=mem)
    asyncio.run(agent.run("which region has the most revenue?", sales_csv))
    # successful run stored a reusable skill
    skills = asyncio.run(mem.search_skills("revenue by region"))
    assert "sum revenue per region" in skills

    # a second run sees the experience in the planner prompt
    seen = {}

    def rule2(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You are a data analyst planning"):
            seen["prompt"] = content
            return FakeChatClient.text_response('["sum revenue per region"]')
        return _client(GOOD_CODE)[0].rule_fn(messages, tools)

    agent2 = ExcelAgent(client=FakeChatClient(rule_fn=rule2), memory_toolkit=mem)
    asyncio.run(agent2.run("total revenue for north region?", sales_csv))
    assert "Past successful approaches" in seen["prompt"]


# -- MCTS planner -------------------------------------------------------------


def test_mcts_planner_prefers_better_branch():
    from youtu_rag_tpu.integrations.dtr.mcts_planner import MCTSPlanner

    rewards = {"bad": 0.2, "better": 0.6, "best": 1.0}
    proposals = iter([["better"], ["best"]])

    async def propose(parent_plan, feedback):
        return next(proposals, parent_plan)

    async def rollout(plan):
        return rewards[plan[0]], {"plan": plan}

    async def go():
        p = MCTSPlanner(propose, rollout, iterations=4)
        return await p.search([["bad"]])

    best = asyncio.run(go())
    # search escalates bad -> better -> best and early-stops at reward 1.0
    assert best.plan == ["best"] and best.reward == 1.0
    stats = type(best).__mro__ and __import__(
        "youtu_rag_tpu.integrations.dtr.mcts_planner", fromlist=["MCTSPlanner"]
    ).MCTSPlanner.stats(best)
    assert stats["nodes"] >= 2


def test_mcts_planner_early_stop_budget():
    from youtu_rag_tpu.integrations.dtr.mcts_planner import MCTSPlanner

    calls = {"rollouts": 0}

    async def propose(parent_plan, feedback):
        return parent_plan + ["again"]

    async def rollout(plan):
        calls["rollouts"] += 1
        return 1.0, None

    async def go():
        return await MCTSPlanner(propose, rollout, iterations=8).search([["a"]])

    best = asyncio.run(go())
    assert calls["rollouts"] == 1  # perfect first rollout stops the search
    assert best.plan == ["a"]


def test_mcts_planner_requires_plan():
    from youtu_rag_tpu.integrations.dtr.mcts_planner import MCTSPlanner

    async def go():
        async def f(*a):
            return []

        await MCTSPlanner(f, f).search([])

    with pytest.raises(ValueError):
        asyncio.run(go())


def test_excel_agent_mcts_mode(sales_csv):
    """MCTS mode: the first plan's code fails, the refined plan succeeds;
    the final answer comes from the winning rollout."""
    state = {"code_calls": 0}

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You are a data analyst planning"):
            return FakeChatClient.text_response('["broken first plan"]')
        if content.startswith("Improve this spreadsheet analysis plan"):
            return FakeChatClient.text_response('["sum revenue per region"]')
        if content.startswith("Write pandas code"):
            state["code_calls"] += 1
            if "broken first plan" in content:
                return FakeChatClient.text_response("print(undefined_variable)")
            return FakeChatClient.text_response(
                "```python\nprint(dfs['Sheet1'].groupby('region').revenue.sum().to_dict())\n```"
            )
        if content.startswith("Did this step execution succeed"):
            ok = "Error" not in content and "330" in content
            return FakeChatClient.text_response(json.dumps({"success": ok, "reason": ""}))
        if content.startswith("Answer the question"):
            assert "330" in content  # winning rollout feeds the answer
            return FakeChatClient.text_response("North leads with 330.")
        raise AssertionError(f"unexpected prompt: {content[:60]}")

    agent = ExcelAgent(
        client=FakeChatClient(rule_fn=rule),
        planner="mcts",
        mcts_iterations=3,
        max_code_retries=1,
    )
    async def go():
        rec = agent.run_streamed("which region has the most revenue?", sales_csv)
        events = [e async for e in rec.stream_events()]
        return await rec.wait(), events

    rec, events = asyncio.run(go())
    assert rec.final_output == "North leads with 330."
    mcts_events = [e for e in events if e.type == "plan" and e.data and "mcts" in e.data]
    assert mcts_events and mcts_events[0].data["best_reward"] == 1.0
    assert mcts_events[0].data["best_plan"] == ["sum revenue per region"]


def test_excel_agent_batch_eval(sales_csv):
    """eval_mode='batch': per-step EVAL_PROMPT calls are skipped; one
    reviewing-{n}-steps call verdicts the whole plan."""
    calls = {"step_eval": 0, "batch_eval": 0}

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You are a data analyst planning"):
            return FakeChatClient.text_response(
                '["load the data", "sum revenue per region"]'
            )
        if content.startswith("Write pandas code"):
            return FakeChatClient.text_response(f"```python\n{GOOD_CODE}\n```")
        if content.startswith("Did this step execution succeed"):
            calls["step_eval"] += 1
            return FakeChatClient.text_response('{"success": true}')
        if content.startswith("You are reviewing"):
            calls["batch_eval"] += 1
            return FakeChatClient.text_response(
                '[{"id": 1, "success": true, "reason": "ok"},'
                ' {"id": 2, "success": false, "reason": "wrong column"}]'
            )
        if content.startswith("Answer the question"):
            return FakeChatClient.text_response("North, 330.")
        return FakeChatClient.text_response("?")

    agent = ExcelAgent(client=FakeChatClient(rule_fn=rule), eval_mode="batch")
    rec = asyncio.run(agent.run("which region has the most revenue?", sales_csv))
    assert rec.final_output
    assert calls["step_eval"] == 0
    assert calls["batch_eval"] == 1
    # the batch verdict overrode the heuristic: step 2 flipped to failed
    nodes = agent.last_smg.nodes
    assert [n.success for n in nodes[-2:]] == [True, False]
    # session rows carry the final (post-batch) verdicts
    ops = [e for e in agent.last_session.events if e["action"] == "execute_operator"]
    assert [o["success"] for o in ops] == [True, False]


def test_batch_eval_parse_failure_falls_back(sales_csv):
    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You are a data analyst planning"):
            return FakeChatClient.text_response('["sum revenue per region"]')
        if content.startswith("Write pandas code"):
            return FakeChatClient.text_response(f"```python\n{GOOD_CODE}\n```")
        if content.startswith("You are reviewing"):
            return FakeChatClient.text_response("not json at all")
        if content.startswith("Answer the question"):
            return FakeChatClient.text_response("North, 330.")
        return FakeChatClient.text_response("?")

    agent = ExcelAgent(client=FakeChatClient(rule_fn=rule), eval_mode="batch")
    rec = asyncio.run(agent.run("which region has the most revenue?", sales_csv))
    assert "330" in rec.final_output
    # heuristic fallback: clean execution counts as success
    assert agent.last_smg.nodes[-1].success
