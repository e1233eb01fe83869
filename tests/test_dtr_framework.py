"""DTR framework-level quality control (ref dtr_framework.py:92-695):
error-answer detection, retry-with-replanning, direct-LLM fallback,
extraction from the original table, cost accounting, sessions."""

import asyncio
import json

import pandas as pd
import pytest

from youtu_rag_tpu.agents.llm import FakeChatClient
from youtu_rag_tpu.integrations.dtr.answer import (
    direct_llm_answer,
    extract_from_original,
    is_error_answer,
    strip_point_zero,
)
from youtu_rag_tpu.integrations.dtr.excel_agent import ExcelAgent
from youtu_rag_tpu.integrations.dtr.framework import DTRFramework
from youtu_rag_tpu.integrations.dtr.smg import SheetStateMachine


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


def test_is_error_answer():
    assert is_error_answer(None)
    assert is_error_answer("   ")
    assert is_error_answer("Execution failed: KeyError")
    assert is_error_answer("[Final Answer]: No data available")
    assert is_error_answer("Analysis did not produce a result. Failed steps: [step 1]")
    assert not is_error_answer("North leads with total revenue 330.")


def test_strip_point_zero():
    assert strip_point_zero("158772.0 units in 1955, 62170.0") == "158772 units in 1955, 62170"
    # real decimals and sub-1 floats survive
    assert strip_point_zero("rate 5.8, base 0.0, pi 3.14") == "rate 5.8, base 0.0, pi 3.14"
    assert strip_point_zero("v1.0.0 stays") == "v1.0.0 stays"


GOOD_CODE = "g = dfs['Sheet1'].groupby('region')['revenue'].sum()\nprint(g.to_dict())"


def _recovery_client(retry_plan_works: bool):
    """Scripted run: first plan's code always fails → error answer →
    recovery. With ``retry_plan_works`` the replanned path succeeds;
    otherwise the direct-LLM rung answers."""
    state = {"retry_plans": 0, "direct": 0}

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You are a data analyst planning"):
            return FakeChatClient.text_response('["broken step"]')
        if content.startswith("The previous analysis of this question failed"):
            state["retry_plans"] += 1
            if retry_plan_works:
                return FakeChatClient.text_response('["sum revenue per region"]')
            return FakeChatClient.text_response("no plan, sorry")
        if content.startswith("Write pandas code"):
            if "broken step" in content:
                return FakeChatClient.text_response("print(undefined_variable)")
            return FakeChatClient.text_response(f"```python\n{GOOD_CODE}\n```")
        if content.startswith("Did this step execution succeed"):
            ok = "Error" not in content and "330" in content
            return FakeChatClient.text_response(json.dumps({"success": ok, "reason": "r"}))
        if content.startswith("Answer the question directly from the table data"):
            state["direct"] += 1
            return FakeChatClient.text_response("[Final Answer]: north, 330")
        if content.startswith("Answer the question"):
            if "330" in content:
                return FakeChatClient.text_response("North leads with total revenue 330.")
            return FakeChatClient.text_response("Execution failed: nothing worked")
        return FakeChatClient.text_response("?")

    return FakeChatClient(rule_fn=rule), state


def test_recovery_replanning_succeeds(sales_csv):
    client, state = _recovery_client(retry_plan_works=True)
    agent = ExcelAgent(client=client, max_code_retries=0)
    rec = asyncio.run(agent.run("which region has the most revenue?", sales_csv))
    assert state["retry_plans"] == 1
    assert "330" in rec.final_output
    assert not is_error_answer(rec.final_output)


def test_recovery_falls_to_direct_llm(sales_csv):
    client, state = _recovery_client(retry_plan_works=False)
    agent = ExcelAgent(client=client, max_code_retries=0)
    rec = asyncio.run(agent.run("which region has the most revenue?", sales_csv))
    assert state["direct"] == 1
    assert rec.final_output == "north, 330"


def test_direct_llm_answer_short_mode(sales_csv):
    smg = SheetStateMachine(sales_csv)
    seen = {}

    async def chat(prompt):
        seen["prompt"] = prompt
        return "[Final Answer]: 330.0"

    ans = asyncio.run(direct_llm_answer("what is the total revenue of north?", smg, chat))
    assert ans == "330"  # point-zero stripped
    assert "SHORT answer" in seen["prompt"]  # aggregation → value-only style
    assert "region" in seen["prompt"]  # rendered table included


def test_extract_from_original_no_data(sales_csv):
    smg = SheetStateMachine(sales_csv)

    async def chat(prompt):
        return "[Final Answer]: No data available"

    assert asyncio.run(extract_from_original("what is the CEO's name?", smg, chat)) is None

    async def chat2(prompt):
        return "[Final Answer]: east has the least revenue (60)"

    out = asyncio.run(extract_from_original("least revenue region?", smg, chat2))
    assert out is not None and "east" in out


def test_framework_process_query_contract(sales_csv, tmp_path):
    client, _ = _recovery_client(retry_plan_works=True)
    fw = DTRFramework(client=client, session_dir=str(tmp_path / "sess"))
    fw.agent.max_code_retries = 0
    res = asyncio.run(fw.process_query("which region has the most revenue?", sales_csv))
    assert "330" in res["final_answer"]
    assert res["llm_calls"] > 0
    assert res["error"] is None
    assert isinstance(res["execution_trace"], list) and res["execution_trace"]
    tr = res["execution_trace"][0]
    assert {"operation", "code", "success", "error", "reward"} <= set(tr)
    # the trace is the winning path's nodes (reset_to truncates the failed
    # first plan — ref: execution_trace covers the best path's memory_nodes)
    assert all(t["success"] and t["error"] is None for t in res["execution_trace"])
    assert res["memory_summary"]["steps"] == len(res["execution_trace"])


def test_framework_trace_records_failures(sales_csv, tmp_path):
    """When no plan ever succeeds, the failed nodes stay in the trace
    with their error tails."""
    client, _ = _recovery_client(retry_plan_works=False)
    fw = DTRFramework(client=client, session_dir=str(tmp_path / "s"))
    fw.agent.max_code_retries = 0
    res = asyncio.run(fw.process_query("which region has the most revenue?", sales_csv))
    assert res["final_answer"] == "north, 330"  # direct-LLM rung answered
    assert any(not t["success"] and t["error"] for t in res["execution_trace"])

    # session persistence round-trip
    fw.save_session("s1")
    assert fw.load_session("s1")
    assert fw.get_memory_stats()["steps"] >= 1
    fw.clear_memory()
    assert fw.get_memory_stats() == {"steps": 0}
    assert not fw.load_session("missing")


def test_experience_persists_across_runs(sales_csv, tmp_path):
    """Two runs with the same experience file: the second run's machine
    starts with the first run's operator stats loaded."""
    exp = tmp_path / "exp.json"
    client, _ = _recovery_client(retry_plan_works=True)
    agent = ExcelAgent(client=client, max_code_retries=0, experience_path=str(exp))
    asyncio.run(agent.run("which region has the most revenue?", sales_csv))
    assert exp.exists()
    first_stats = dict(agent.last_smg.op_stats)
    assert first_stats

    client2, _ = _recovery_client(retry_plan_works=True)
    agent2 = ExcelAgent(client=client2, max_code_retries=0, experience_path=str(exp))
    asyncio.run(agent2.run("which region has the most revenue?", sales_csv))
    # second run accumulated on top of the loaded stats
    for sig, st in first_stats.items():
        assert agent2.last_smg.op_stats[sig]["uses"] >= st["uses"]
