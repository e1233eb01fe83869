"""Units for the DTR Excel-QA benchmark harness (scripts/bench_dtr.py)."""

import importlib.util
import pathlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _mod():
    spec = importlib.util.spec_from_file_location(
        "bench_dtr", ROOT / "scripts" / "bench_dtr.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


BRIEF = """- orders: 120 rows x 5 cols
  columns: region (categorical; values: north, south); product (categorical; values: gizmo, widget); qty (numeric); revenue (numeric)
  sample: [{'region': 'north', 'product': 'gizmo', 'qty': 1, 'revenue': 2}]
- products: 6 rows x 3 cols
  columns: product (categorical; values: gizmo, widget); category (categorical; values: gadgets); unit_cost (numeric)
  sample: [{'product': 'gizmo', 'category': 'gadgets', 'unit_cost': 38.0}]
"""


def test_parse_brief_keeps_categoricals():
    a = _mod().ScriptedAnalyst()
    sheets = a.parse_brief(BRIEF)
    assert sheets["orders"]["region"]["values"] == ["north", "south"]
    assert sheets["orders"]["revenue"]["semantic"] == "numeric"
    assert "unit_cost" in sheets["products"]


def test_author_filtered_aggregate():
    code = _mod().ScriptedAnalyst().author(
        "What is the total revenue in region 'north'?", BRIEF
    )
    assert "== 'north'" in code and ".sum()" in code and "revenue" in code


def test_author_cross_sheet_lookup_joins_or_rebinds():
    code = _mod().ScriptedAnalyst().author(
        "What is the unit_cost of product 'gizmo'?", BRIEF
    )
    assert "unit_cost" in code
    assert "products" in code  # resolved to the sheet holding the column


def test_author_superlative_groupby():
    code = _mod().ScriptedAnalyst().author(
        "Which region has the highest total revenue?", BRIEF
    )
    assert "groupby('region')" in code and "idxmax" in code


def test_gold_matches_numeric_forms():
    m = _mod()
    assert m.gold_matches(91557, "total is 91557 for north")
    assert m.gold_matches(38.0, "unit cost: 38.0")
    assert m.gold_matches(38.0, "the value is 38")
    assert not m.gold_matches(38.0, "the value is 39")
    assert m.gold_matches("north", "North leads the table")


def test_fixture_determinism_and_committed():
    m = _mod()
    w1 = m.gen_workbooks(np.random.default_rng(23))
    w2 = m.gen_workbooks(np.random.default_rng(23))
    for wb in w1:
        for s in w1[wb]:
            assert w1[wb][s].equals(w2[wb][s])
    q1 = m.gen_questions(w1)
    assert len(q1) >= 30
    assert {q["kind"] for q in q1} >= {"lookup", "aggregate", "join",
                                       "superlative", "chart", "hard"}
    data = ROOT / "benchmarks" / "data" / "dtr"
    assert (data / "questions.json").exists()
    assert (data / "wb_sales" / "orders.csv").exists()
    assert (data / "wb_ops" / "incidents.csv").exists()
