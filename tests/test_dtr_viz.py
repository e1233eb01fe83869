"""Chart/report generation (VERDICT r2 item 4, Excel-QA Aesthetics slot):
deterministic ChartSpec selection, sandboxed rendering to PNG, LLM chart
code hardening, and the report composition surface."""

import asyncio
import os

import pandas as pd
import pytest

from youtu_rag_tpu.integrations.dtr.smg import SheetStateMachine, SMGNode, TableState
from youtu_rag_tpu.integrations.dtr.viz import (
    ChartSpec,
    chart_spec,
    compose_report,
    generate_chart,
    is_visualization_question,
    spec_to_code,
)


def test_visualization_intent():
    assert is_visualization_question("draw a bar chart of revenue by region")
    assert is_visualization_question("请绘制销售趋势图表")
    assert not is_visualization_question("what is the total revenue?")


def test_chart_spec_choices():
    cat_num = TableState((10, 2), ["region", "revenue"], {"region": "object", "revenue": "int64"})
    assert chart_spec(cat_num, "revenue by region").kind == "bar"
    assert chart_spec(cat_num, "revenue share by region").kind == "pie"
    time_num = TableState((10, 2), ["month", "sales"], {"month": "object", "sales": "float64"})
    assert chart_spec(time_num, "sales trend").kind == "line"
    only_num = TableState((10, 1), ["price"], {"price": "float64"})
    assert chart_spec(only_num, "distribution").kind == "hist"
    no_num = TableState((10, 1), ["name"], {"name": "object"})
    assert chart_spec(no_num, "q") is None


@pytest.fixture
def sales_csv(tmp_path):
    pd.DataFrame(
        {"region": ["n", "s", "n", "e"], "revenue": [10, 20, 30, 40]}
    ).to_csv(tmp_path / "sales.csv", index=False)
    return str(tmp_path / "sales.csv")


def test_deterministic_chart_renders_png(sales_csv, tmp_path):
    smg = SheetStateMachine(sales_csv)
    chart = str(tmp_path / "out.png")
    path, code = asyncio.run(
        generate_chart(smg, "bar chart of revenue by region", None, chart)
    )
    assert path == chart and os.path.exists(chart)
    assert os.path.getsize(chart) > 1000  # a real PNG, not a stub
    assert "plt.bar" in code


def test_spec_code_runs_for_each_kind(sales_csv, tmp_path):
    smg = SheetStateMachine(sales_csv)
    st = TableState((4, 2), ["region", "revenue"], {"region": "object", "revenue": "int64"})
    for kind in ("bar", "pie", "line", "hist"):
        spec = ChartSpec(kind, "region" if kind in ("bar", "pie") else None, "revenue", f"{kind} t")
        chart = str(tmp_path / f"{kind}.png")
        code = spec_to_code(spec, "dfs['Sheet1']", chart)
        out, _ = asyncio.run(smg.execute_step(code))
        assert "chart saved" in out, (kind, out)
        assert os.path.exists(chart), kind
    assert st  # silence linters


def test_llm_chart_code_hardened(sales_csv, tmp_path):
    """LLM code with plt.show() and no savefig still produces the PNG."""
    smg = SheetStateMachine(sales_csv)
    chart = str(tmp_path / "llm.png")

    async def llm(prompt):
        if "failed" in prompt:
            raise AssertionError("repair loop should not trigger")
        return (
            "```python\nimport pandas as pd\nimport matplotlib.pyplot as plt\n"
            "g = dfs['Sheet1'].groupby('region')['revenue'].sum()\n"
            "plt.bar(g.index, g.values)\nplt.show()\n```"
        )

    path, code = asyncio.run(generate_chart(smg, "bar chart", llm, chart))
    assert path == chart and os.path.exists(chart)


def test_llm_chart_repair_then_fallback(sales_csv, tmp_path):
    """Persistently failing LLM code falls back to the deterministic spec."""
    smg = SheetStateMachine(sales_csv)
    chart = str(tmp_path / "fb.png")

    async def llm(prompt):
        return "```python\nraise RuntimeError('nope')\n```"

    path, code = asyncio.run(
        generate_chart(smg, "bar chart of revenue by region", llm, chart)
    )
    assert path == chart and os.path.exists(chart)
    assert "plt.bar" in code  # the deterministic fallback's code


def test_compose_report_structure():
    nodes = [SMGNode("load data", success=True), SMGNode("bad step", success=False)]
    rep = compose_report(
        "q?", "The answer is 42.", nodes, table="|a|\n|-|\n|1|", chart_path="/tmp/c.png",
        chart_code="plt.bar(x, y)",
    )
    assert "# Analysis Report" in rep and "The answer is 42." in rep
    assert "![chart](/tmp/c.png)" in rep and "plt.bar" in rep
    assert "|a|" in rep and "✅ load data" in rep and "❌ bad step" in rep


def test_synthesize_answer_viz_route(sales_csv, tmp_path):
    """A visualization question returns a full report with an embedded
    chart even with no LLM configured."""
    from youtu_rag_tpu.integrations.dtr.answer import synthesize_answer

    smg = SheetStateMachine(sales_csv)
    node = SMGNode("aggregate", code="g = dfs['Sheet1'].groupby('region')['revenue'].sum().reset_index()\nprint(g)")

    async def run():
        out, state = await smg.execute_step(node.code)
        node.output, node.success = out, True
        smg.record(node, state)
        return await synthesize_answer(
            "plot revenue by region", [node], None, smg.state, machine=smg,
            chart_dir=str(tmp_path),
        )

    rep = asyncio.run(run())
    assert "# Analysis Report" in rep
    assert os.path.exists(os.path.join(str(tmp_path), "chart.png"))
