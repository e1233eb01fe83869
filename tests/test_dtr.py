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
