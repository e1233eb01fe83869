"""ADO operator decomposition (capability parity with the reference's
ado_module: fixed operator pool, unordered selection, plan validity)."""

import pandas as pd

from youtu_rag_tpu.integrations.dtr.loader import profile_workbook
from youtu_rag_tpu.integrations.dtr.operators import (
    OPERATOR_POOL,
    decompose,
    _shared_columns,
)


def _profiles():
    sheets = {
        "orders": pd.DataFrame(
            {
                "order_id": range(1, 21),
                "region": ["north", "south"] * 10,
                "amount": [float(i) for i in range(20)],
                "date": pd.to_datetime(["2024-01-01"] * 20),
            }
        ),
        "stores": pd.DataFrame({"region": ["north", "south"], "manager": ["a", "b"]}),
    }
    return profile_workbook(sheets)


def test_pool_categories():
    cats = {op.category for op in OPERATOR_POOL}
    assert cats == {"understand", "clean", "transform", "combine", "aggregate", "present"}
    assert len({op.name for op in OPERATOR_POOL}) == len(OPERATOR_POOL)


def test_baseline_ops_always_selected():
    r = decompose("do the thing")
    assert "DETECT_SCHEMA" in r.names and "FORMAT_RESULT" in r.names


def test_aggregation_selects_group_aggregate():
    r = decompose("What is the total amount per region?", _profiles())
    assert "GROUP_AGGREGATE" in r.names


def test_trend_selects_time_ops():
    r = decompose("Show the monthly sales trend over time", _profiles())
    assert "TREND_OVER_TIME" in r.names
    assert "PARSE_DATES" in r.names  # datetime column present + temporal kw


def test_multi_sheet_shared_key_selects_join():
    r = decompose("Which manager has the highest total amount?", _profiles())
    assert "JOIN_SHEETS" in r.names  # orders+stores share 'region'
    assert "SORT_RANK" in r.names
    assert "region" in r.rationale["JOIN_SHEETS"]


def test_categorical_value_in_question_selects_filter():
    r = decompose("total amount for north stores", _profiles())
    assert "FILTER_ROWS" in r.names


def test_single_sheet_no_join():
    profs = [p for p in _profiles() if p.name == "orders"]
    r = decompose("what is the total amount?", profs)
    assert "JOIN_SHEETS" not in r.names


def test_shared_columns():
    assert _shared_columns(_profiles()) == ["region"]


def test_prompt_block_and_budget():
    r = decompose("Compare north versus south total amount", _profiles())
    block = r.prompt_block()
    assert "COMPARE_GROUPS" in block and "Relevant operators" in block
    assert r.budget() >= 2


def test_plan_coverage():
    r = decompose("total amount per region", _profiles())
    good = ["group rows by region and sum amount", "print the result table"]
    bad = ["scrape the website", "email the CFO"]
    assert r.plan_coverage(good) == 1.0
    assert r.plan_coverage(bad) < 0.5
    assert r.plan_coverage([]) == 0.0
