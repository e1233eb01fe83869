"""DTR reward evaluator + workbook profiler (ref: DTR reward evaluator and
multi-sheet loader modules)."""

import pandas as pd

from youtu_rag_tpu.integrations.dtr.loader import (
    load_sheets,
    profile_workbook,
    workbook_brief,
)
from youtu_rag_tpu.integrations.dtr.reward import (
    evaluate_plan,
    evaluate_step,
    reward_feedback,
)
from youtu_rag_tpu.integrations.dtr.smg import SMGNode, TableState


def _node(desc, code="df = dfs['Sheet1']", output="42", success=True, attempts=1,
          before=None, after=None):
    n = SMGNode(desc, code=code, output=output, success=success, attempts=attempts)
    n.state_before = before or {}
    n.state_after = after or {}
    return n


def test_graded_rewards_order_sensibly():
    good = _node(
        "compute total revenue",
        code="rev = dfs['Sheet1']['revenue'].sum()\nprint(rev)",
        output="12345.6",
        after={"rev": TableState((1, 1), ["revenue"], {})},
    )
    empty = _node("compute total revenue", output="Empty DataFrame")
    failed = _node("compute total revenue", output="KeyError: 'revenue'", success=False)
    r_good, r_empty, r_failed = (evaluate_step(n).total for n in (good, empty, failed))
    assert r_good > r_empty > r_failed
    assert r_failed < 0.1  # failures earn at most a sliver
    assert 0.0 <= r_good <= 1.0


def test_retries_and_long_code_penalized():
    quick = _node("filter rows", output="10 rows")
    retried = _node("filter rows", output="10 rows", attempts=3)
    assert evaluate_step(quick).total > evaluate_step(retried).total
    long_code = _node("filter rows", code="\n".join(["x = 1"] * 200), output="10 rows")
    assert evaluate_step(quick).total > evaluate_step(long_code).total


def test_plan_reward_completion_bonus():
    steps_ok = [
        _node("load data", output="loaded 100 rows"),
        _node("sum revenue by region", output="north: 10, south: 20"),
    ]
    for s in steps_ok:
        s.reward = 0.5  # fixed mid-range step rewards so bonuses are visible
    failed_final = [
        _node("load data", output="loaded 100 rows"),
        _node("sum revenue by region", output="KeyError", success=False),
    ]
    for s in failed_final:
        s.reward = 0.5
    with_q = evaluate_plan(steps_ok, question="what is the revenue by region?")
    no_q = evaluate_plan(steps_ok)
    no_bonus = evaluate_plan(failed_final)
    assert with_q > no_q > no_bonus == 0.5  # question overlap > generic bonus > none
    assert evaluate_plan([]) == 0.0
    fb = reward_feedback(steps_ok)
    assert "step 1 [ok]" in fb


def test_header_detection_and_profiles(tmp_path):
    # headerless CSV: first row is data → synthetic col names
    raw = tmp_path / "noheader.csv"
    raw.write_text("1,2.5,x\n2,3.5,y\n3,4.5,z\n")
    sheets = load_sheets(str(raw))
    df = sheets["Sheet1"]
    assert list(df.columns) == ["col_0", "col_1", "col_2"]
    assert df.shape == (3, 3)

    # headered CSV keeps its names and profiles semantic types
    ok = tmp_path / "sales.csv"
    ok.write_text(
        "order_id,region,amount,when\n"
        + "\n".join(f"{i},{'north' if i % 2 else 'south'},{i * 1.5},2024-01-{i + 1:02d}" for i in range(25))
    )
    profiles = profile_workbook(load_sheets(str(ok)))
    cols = {c.name: c for c in profiles[0].columns}
    assert cols["order_id"].semantic == "id"
    assert cols["region"].semantic == "categorical"
    assert set(cols["region"].top_values) == {"north", "south"}
    assert cols["amount"].semantic == "numeric"
    assert cols["when"].semantic == "datetime"
    brief = workbook_brief(profiles, relevant={"Sheet1": ["amount"]})
    assert "categorical" in brief and "relevant columns: amount" in brief


def test_excel_agent_schema_uses_profiler(tmp_path):
    f = tmp_path / "t.csv"
    f.write_text("a,b\n1,x\n2,y\n")
    from youtu_rag_tpu.integrations.dtr.excel_agent import ExcelAgent

    brief = ExcelAgent.load_schema(str(f))
    assert "2 rows x 2 cols" in brief and "columns:" in brief


# ------------------------------------------------------------- join keys


def test_detect_join_keys_value_overlap():
    """Join detection is by VALUE overlap, not column names: differently
    named id columns sharing a domain are found; same-named columns with
    disjoint domains are rejected."""
    import pandas as pd

    from youtu_rag_tpu.integrations.dtr.loader import detect_join_keys

    orders = pd.DataFrame({
        "cust_id": [f"C{i}" for i in range(20)] * 2,
        "amount": range(40),
        "status": ["open", "closed"] * 20,
    })
    customers = pd.DataFrame({
        "customer": [f"C{i}" for i in range(25)],
        "region": ["north", "south", "east", "west", "north"] * 5,
        # same NAME as orders.status but a disjoint domain → not a join
        "status": [f"tier-{i % 7}" for i in range(25)],
    })
    joins = detect_join_keys({"orders": orders, "customers": customers})
    assert joins, "expected at least one join candidate"
    top = joins[0]
    assert {top[1], top[3]} == {"cust_id", "customer"}
    assert top[4] >= 0.5
    assert not any(ca == cb == "status" for _, ca, _, cb, _ in joins)


def test_join_keys_float_promoted_int_ids():
    """Integer id columns promoted to float64 by blank cells still join
    (values render without the '.0'); true float measurements do not."""
    import numpy as np
    import pandas as pd

    from youtu_rag_tpu.integrations.dtr.loader import detect_join_keys

    orders = pd.DataFrame({
        "cust": [float(i) for i in range(12)] + [np.nan, np.nan],
        "temp": np.linspace(0.1, 1.4, 14),  # true floats: never a key
    })
    customers = pd.DataFrame({"cust_id": list(range(15)), "name": [f"n{i}" for i in range(15)]})
    joins = detect_join_keys({"orders": orders, "customers": customers})
    assert joins and {joins[0][1], joins[0][3]} == {"cust", "cust_id"}
    assert not any("temp" in (ca, cb) for _, ca, _, cb, _ in joins)


def test_join_keys_low_cardinality_rejected():
    """Shared status/flag columns (100% overlap, tiny domains) must not
    produce join candidates that evict real keys."""
    import pandas as pd

    from youtu_rag_tpu.integrations.dtr.loader import detect_join_keys

    a = pd.DataFrame({
        "id": [f"K{i}" for i in range(30)],
        "status": ["open", "closed"] * 15,
        "flag": ["y", "n"] * 15,
    })
    b = pd.DataFrame({
        "key": [f"K{i}" for i in range(25)],
        "status": ["open", "closed"] * 12 + ["open"],
        "flag": ["y", "n"] * 12 + ["y"],
    })
    joins = detect_join_keys({"a": a, "b": b})
    assert joins and {joins[0][1], joins[0][3]} == {"id", "key"}
    assert not any(ca == "status" or ca == "flag" for _, ca, _, cb, _ in joins)


def test_join_keys_in_workbook_brief_and_schema():
    import pandas as pd

    from youtu_rag_tpu.integrations.dtr.excel_agent import ExcelAgent

    skus = [f"sku-{i}" for i in range(8)]
    sheets = {
        "sales": pd.DataFrame({"sku": skus * 3, "units": range(24)}),
        "products": pd.DataFrame({"sku": skus, "price": range(8)}),
    }
    brief = ExcelAgent.load_schema("ignored.csv", "total revenue per product", sheets=sheets)
    assert "likely join keys" in brief
    assert "sales.sku" in brief and "products.sku" in brief
