"""Autonomous SMG loop (VERDICT r2 item 4): on a multi-sheet join where
the planner is locked into a wrong column, the linear path fails while the
autonomous loop corrects itself from the execution feedback and succeeds."""

import asyncio
import json

import pandas as pd
import pytest

from youtu_rag_tpu.agents.llm import FakeChatClient
from youtu_rag_tpu.integrations.dtr.excel_agent import ExcelAgent


@pytest.fixture
def join_xlsx(tmp_path):
    """Two sheets (csv-directory workbook — no openpyxl in the image) that
    must be joined on `pid` — NOT on `id` (which exists in orders but not
    products; the natural wrong guess)."""
    wb = tmp_path / "workbook"
    wb.mkdir()
    pd.DataFrame(
        {"pid": ["a", "b", "c"], "name": ["ax", "bx", "cx"], "price": [5, 7, 9]}
    ).to_csv(wb / "products.csv", index=False)
    pd.DataFrame(
        {"id": [1, 2, 3, 4], "pid": ["a", "b", "a", "c"], "qty": [2, 1, 3, 4]}
    ).to_csv(wb / "orders.csv", index=False)
    return str(wb)


BAD_JOIN = (
    "m = dfs['orders'].merge(dfs['products'], on='id')\n"
    "rev = (m['price'] * m['qty']).sum()\nprint('revenue', rev)"
)
GOOD_JOIN = (
    "m = dfs['orders'].merge(dfs['products'], on='pid')\n"
    "rev = (m['price'] * m['qty']).sum()\nprint('revenue', rev)"
)
# a*2 + b*1 + a*3 + c*4 = 10 + 7 + 15 + 36 = 68
EXPECTED = "68"


def _linear_client():
    """A planner locked into the wrong join column: every code request —
    retries included — produces the id-join. The linear path has no way
    out (plan is fixed, the code generator ignores the error context)."""

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You are a data analyst planning"):
            return FakeChatClient.text_response('["join orders to products and sum revenue"]')
        if content.startswith("Write pandas code"):
            return FakeChatClient.text_response(f"```python\n{BAD_JOIN}\n```")
        if content.startswith("Did this step execution succeed"):
            ok = "Error" not in content
            return FakeChatClient.text_response(json.dumps({"success": ok, "reason": "merge key"}))
        if content.startswith("Answer the question"):
            return FakeChatClient.text_response("The analysis failed to produce revenue.")
        return FakeChatClient.text_response("?")

    return FakeChatClient(rule_fn=rule)


def _autonomous_client(calls):
    """Adapts from feedback: first CODE turn uses the wrong key; when the
    history shows the failure feedback, it corrects; after a successful
    turn it answers."""

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("# Autonomous tabular analysis"):
            calls.append(1)
            if "revenue 68" in content:
                return FakeChatClient.text_response(f"[Final Answer]\nTotal revenue is {EXPECTED}.")
            if "[feedback] FAILED" in content:
                return FakeChatClient.text_response(f"[CODE]\n```python\n{GOOD_JOIN}\n```")
            return FakeChatClient.text_response(f"[CODE]\n```python\n{BAD_JOIN}\n```")
        return FakeChatClient.text_response("?")

    return FakeChatClient(rule_fn=rule)


def test_linear_planner_fails_on_wrong_join(join_xlsx):
    agent = ExcelAgent(client=_linear_client(), planner="linear", max_code_retries=1)
    rec = asyncio.run(agent.run("total revenue from orders joined to products?", join_xlsx))
    assert EXPECTED not in (rec.final_output or "")


def test_autonomous_loop_corrects_from_feedback(join_xlsx):
    calls = []
    agent = ExcelAgent(client=_autonomous_client(calls), planner="autonomous")
    rec = asyncio.run(agent.run("total revenue from orders joined to products?", join_xlsx))
    assert EXPECTED in rec.final_output
    # the loop genuinely iterated: bad code → feedback → fix → answer
    assert len(calls) >= 3


def test_autonomous_receives_operator_reference(join_xlsx):
    """The ADO operator sequence rides into the autonomous prompt as the
    advisory reference (ref smg_autonomous operator reference)."""
    seen = {}

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("# Autonomous tabular analysis"):
            seen["prompt"] = content
            return FakeChatClient.text_response("[Final Answer]\nnothing to do")
        return FakeChatClient.text_response("?")

    agent = ExcelAgent(client=FakeChatClient(rule_fn=rule), planner="autonomous")
    asyncio.run(agent.run("sum the total qty of orders", join_xlsx))
    assert "Suggested steps (a REFERENCE" in seen["prompt"]
