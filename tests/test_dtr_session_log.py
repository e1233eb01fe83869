"""Structured DTR session trace (integrations/dtr/session_log.py) — the
counterpart of the reference's DTRLogger (dtr_logger.py:15-311): typed
entries, execution summary, path replay, JSON persistence, and the
agent/framework wiring that records real runs."""

import asyncio
import json

import pandas as pd
import pytest

from youtu_rag_tpu.agents.llm import FakeChatClient
from youtu_rag_tpu.integrations.dtr.excel_agent import ExcelAgent
from youtu_rag_tpu.integrations.dtr.framework import DTRFramework
from youtu_rag_tpu.integrations.dtr.session_log import DTRSessionLog


# ------------------------------------------------------------- unit level


def test_summary_and_replay():
    s = DTRSessionLog(session_id="t1")
    pid = s.new_path_id()
    s.log_operator_execution(pid, 0, "load", "c0", "ok", True, 0.8, 1)
    s.log_operator_execution(pid, 1, "group", "c1", "Error: x", False, 0.1, 2)
    s.log_path_completion(pid, ["load", "group"], 0.9)
    pid2 = s.new_path_id()
    s.log_operator_execution(pid2, 0, "load", "c0", "ok", True, 0.9, 1)
    s.log_path_completion(pid2, ["load"], 0.9)

    summary = s.summary()
    assert summary["total_operators"] == 3
    assert summary["successful_operators"] == 2
    assert summary["paths_executed"] == 2
    assert summary["success_rate"] == pytest.approx(2 / 3)
    assert summary["average_reward"] == pytest.approx(1.8 / 3)

    replay = s.replay_path(pid)
    assert [e["description"] for e in replay] == ["load", "group"]
    assert s.replay_path("path_999") == []


def test_save_roundtrip(tmp_path):
    s = DTRSessionLog(session_id="t2")
    s.log_query("q", "/tmp/x.csv", "linear")
    pid = s.new_path_id()
    s.log_operator_execution(pid, 0, "load", "code", "out", True, 1.0, 1)
    s.log_path_completion(pid, ["load"], 1.0)
    s.log_answer("42", llm_calls=3, tokens=120)
    out = s.save(tmp_path)
    doc = json.loads(out.read_text())
    assert doc["summary"]["total_operators"] == 1
    assert len(doc["views"]["operators"]) == 1
    assert doc["views"]["paths"][0]["cumulative_reward"] == 1.0
    assert doc["events"][0]["action"] == "query"


# ------------------------------------------------------------ agent wiring


@pytest.fixture
def sales_csv(tmp_path):
    df = pd.DataFrame(
        {
            "region": ["north", "south", "north", "east"],
            "revenue": [100, 80, 120, 60],
        }
    )
    p = tmp_path / "sales.csv"
    df.to_csv(p, index=False)
    return str(p)


GOOD_CODE = "g = dfs['Sheet1'].groupby('region')['revenue'].sum()\nprint(g.to_dict())"


def _client():
    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You are a data analyst planning"):
            return FakeChatClient.text_response('["sum revenue per region"]')
        if content.startswith("Write pandas code"):
            return FakeChatClient.text_response(f"```python\n{GOOD_CODE}\n```")
        if content.startswith("Did this step execution succeed"):
            return FakeChatClient.text_response(json.dumps({"success": True, "reason": "r"}))
        if content.startswith("Answer the question"):
            return FakeChatClient.text_response("North leads with 220.")
        return FakeChatClient.text_response("?")

    return FakeChatClient(rule_fn=rule)


def test_agent_records_session(sales_csv):
    agent = ExcelAgent(client=_client(), max_code_retries=0)
    rec = asyncio.run(agent.run("which region leads?", sales_csv))
    assert "220" in rec.final_output
    s = agent.last_session
    assert s is not None
    actions = [e["action"] for e in s.events]
    assert actions[0] == "query"
    assert "plan" in actions and "execute_operator" in actions
    assert actions[-1] == "answer"
    assert s.summary()["total_operators"] == 1
    assert s.summary()["success_rate"] == 1.0
    # the answer entry carries the run's cost accounting
    ans = s.events[-1]
    assert ans["llm_calls"] == agent.llm_calls > 0


def test_framework_saves_trace(sales_csv, tmp_path):
    fw = DTRFramework(client=_client(), session_dir=str(tmp_path / "sess"))
    fw.agent.max_code_retries = 0
    res = asyncio.run(fw.process_query("which region leads?", sales_csv))
    assert res["session_summary"]["total_operators"] == 1
    traces = list((tmp_path / "sess" / "traces").glob("session_*.json"))
    assert len(traces) == 1
    doc = json.loads(traces[0].read_text())
    assert doc["summary"]["successful_operators"] == 1
