"""DTR answer generation: intent analysis, number cleaning, format-error
retry, frame rendering (capability parity with the reference's
answer_generator.py — tested hermetically, which the reference is not)."""

import asyncio

import numpy as np
import pytest

from youtu_rag_tpu.integrations.dtr.answer import (
    analyze_question_intent,
    clean_number_format,
    fallback_answer,
    has_format_errors,
    is_short_answer,
    render_frame,
    synthesize_answer,
)
from youtu_rag_tpu.integrations.dtr.smg import SheetStateMachine, SMGNode


# ---------------------------------------------------------------- intent


@pytest.mark.parametrize(
    "q,intent",
    [
        ("What is the revenue of store 3?", "lookup"),
        ("How many orders were placed in March?", "aggregation"),
        ("total sales per region", "aggregation"),
        ("Compare Q1 versus Q2 margins", "comparison"),
        ("sales trend over time by month", "trend"),
        ("List the products with negative margin", "list"),
        ("Why did returns spike in June?", "why"),
        ("2023年总销售额是多少", "aggregation"),
        ("为什么六月退货增加", "why"),
        ("do the thing", "other"),
    ],
)
def test_intent(q, intent):
    assert analyze_question_intent(q) == intent


def test_short_answer_types():
    assert is_short_answer("lookup") and is_short_answer("aggregation")
    assert not is_short_answer("why") and not is_short_answer("trend")


# ---------------------------------------------------------------- numbers


@pytest.mark.parametrize(
    "raw,clean",
    [
        ("the total is 3.9999999998 units", "the total is 4 units"),
        ("mean 12.50000000001 across rows", "mean 12.5 across rows"),
        ("pi is 3.14159265", "pi is 3.1416"),
        ("| 7.0000000002 | 1.25 |", "| 7 | 1.25 |"),
        ("version 1.2.3 stays", "version 1.2.3 stays"),
        ("short 2.75 stays", "short 2.75 stays"),
    ],
)
def test_clean_number_format(raw, clean):
    assert clean_number_format(raw) == clean


# ---------------------------------------------------------------- format errors


def test_format_errors():
    assert has_format_errors("")
    assert has_format_errors("```python\nprint(1)")  # unbalanced fence
    assert has_format_errors("assistant: here you go")
    assert has_format_errors("The answer is {evidence}")
    assert not has_format_errors("Total revenue was 4,200 [step 2].")
    assert not has_format_errors("a table:\n\n| a |\n|---|\n| 1 |")
    # a balanced fence INSIDE an answer is legitimate formatting
    assert not has_format_errors("Totals by region:\n```\nnorth 12\nsouth 30\n```")


# ---------------------------------------------------------------- synthesis


class FakeChat:
    def __init__(self, replies):
        self.replies = list(replies)
        self.prompts = []

    async def __call__(self, prompt):
        self.prompts.append(prompt)
        return self.replies.pop(0) if self.replies else "fallback reply"


def _nodes():
    n = SMGNode("compute total sales", code="x=1", output="total = 41.9999999997", success=True)
    return [n]


def test_short_answer_prompt_and_cleaning():
    chat = FakeChat(["42.0000000001 units"])
    out = asyncio.run(synthesize_answer("How many units in total?", _nodes(), chat))
    assert out == "42 units"
    assert "ONLY the direct answer" in chat.prompts[0]


def test_detailed_prompt_for_why():
    chat = FakeChat(["Because of returns [step 1]."])
    out = asyncio.run(synthesize_answer("Why did totals drop?", _nodes(), chat))
    assert "[step 1]" in out
    assert "cite the supporting steps" in chat.prompts[0]


def test_format_error_triggers_strict_retry():
    chat = FakeChat(["```python\nbad", "Clean answer: 42"])
    out = asyncio.run(synthesize_answer("How many units?", _nodes(), chat))
    assert out == "Clean answer: 42"
    assert len(chat.prompts) == 2
    assert "formatting problems" in chat.prompts[1]


def test_double_format_error_falls_back():
    chat = FakeChat(["```bad", "system: still bad"])
    out = asyncio.run(synthesize_answer("How many units?", _nodes(), chat))
    assert "42" in out  # deterministic fallback carries the cleaned output
    assert "[step 1]" in out


def test_fallback_with_table():
    out = fallback_answer("q", _nodes(), table="| a |\n|---|\n| 1 |")
    assert "| a |" in out and "42" in out


# ---------------------------------------------------------------- frame render


def test_render_frame_markdown(tmp_path):
    rng = np.random.default_rng(0)
    import pandas as pd

    df = pd.DataFrame({"region": [f"r{i}" for i in range(30)], "sales": rng.integers(1, 9, 30)})
    p = tmp_path / "sales.csv"
    df.to_csv(p, index=False)

    smg = SheetStateMachine(str(p))
    code = "summary = dfs['Sheet1'].groupby('region', as_index=False)['sales'].sum()\nprint(len(summary))"

    async def go():
        out, state = await smg.execute_step(code)
        smg.record(SMGNode("group by region", code=code, output=out, success=True), state)
        table = await render_frame(smg, "summary", max_rows=6)
        missing = await render_frame(smg, "nope")
        return table, missing

    table, missing = asyncio.run(go())
    assert "summary" in smg.state
    assert table is not None
    assert "region" in table and "|" in table
    assert "…" in table  # 30 rows > 6 → sampled with ellipsis row
    # unknown frame renders as None, never raises
    assert missing is None


def test_synthesize_includes_table_in_evidence(tmp_path):
    import pandas as pd

    p = tmp_path / "t.csv"
    pd.DataFrame({"a": [1, 2], "b": [3, 4]}).to_csv(p, index=False)
    smg = SheetStateMachine(str(p))
    code = "res = dfs['Sheet1'].assign(c=lambda d: d.a + d.b)\nprint('ok')"
    chat = FakeChat(["Why answer citing [step 1]."])

    async def go():
        out, state = await smg.execute_step(code)
        smg.record(SMGNode("add column", code=code, output=out, success=True), state)
        await synthesize_answer("Why is c larger?", smg.nodes, chat, smg.state, machine=smg)

    asyncio.run(go())
    assert "Final result table" in chat.prompts[0]
    assert "| " in chat.prompts[0]


# --------------------------------------------- ranking / alt-paths / schema


def test_ranking_intent_and_guidance():
    assert analyze_question_intent("Rank the top 3 stores by revenue") == "ranking"
    assert analyze_question_intent("sort products by margin") == "ranking"
    assert is_short_answer("ranking") and is_short_answer("comparison")
    chat = FakeChat(["Store B, Store A, Store C"])
    asyncio.run(synthesize_answer("Rank the top 3 stores by revenue", _nodes(), chat))
    assert "Ranking/comparison instructions" in chat.prompts[0]
    # non-ranking short answers keep the plain concise prompt
    chat2 = FakeChat(["42"])
    asyncio.run(synthesize_answer("How many units in total?", _nodes(), chat2))
    assert "Ranking/comparison instructions" not in chat2.prompts[0]


def test_alt_paths_section_in_prompt():
    from youtu_rag_tpu.integrations.dtr.answer import format_alt_paths

    alt = [
        {"plan": ["load", "group"], "reward": 0.8, "success": 2, "total": 2,
         "result": "total = 42"},
        {"plan": ["load"], "reward": 0.4, "success": 1, "total": 2, "result": ""},
    ]
    section = format_alt_paths(alt)
    assert "Other execution paths" in section
    assert "reward 0.80" in section and "total = 42" in section
    assert "ONE answer" in section

    chat = FakeChat(["Because of X [step 1]."])
    asyncio.run(
        synthesize_answer("Why did totals drop?", _nodes(), chat, alt_paths=alt)
    )
    assert "Other execution paths" in chat.prompts[0]


def test_schema_hint_in_prompt():
    chat = FakeChat(["42"])
    asyncio.run(
        synthesize_answer(
            "How many units in total?", _nodes(), chat,
            schema_hint="sales: units, region",
        )
    )
    assert "relevant columns: sales: units, region" in chat.prompts[0]


def test_mcts_top_rollouts_ranking():
    from youtu_rag_tpu.integrations.dtr.mcts_planner import MCTSPlanner, PlanNode

    root = PlanNode(plan=[])
    a = PlanNode(plan=["a"], parent=root, reward=0.3)
    b = PlanNode(plan=["b"], parent=root, reward=0.9)
    c = PlanNode(plan=["c"], parent=b, reward=0.6)
    unrolled = PlanNode(plan=["d"], parent=root)  # no rollout yet
    root.children = [a, b, unrolled]
    b.children = [c]
    top = MCTSPlanner.top_rollouts(a, n=2)
    assert [n.plan for n in top] == [["b"], ["c"]]
