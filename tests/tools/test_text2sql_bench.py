"""Units for the text2sql e2e benchmark harness (scripts/bench_text2sql.py).

The full benchmark is a script (minutes); these pin the scripted SQL
author's contracts so refactors can't silently flip the measured story."""

import importlib.util
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[2]


def _mod():
    spec = importlib.util.spec_from_file_location(
        "bench_text2sql", ROOT / "scripts" / "bench_text2sql.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


SCHEMA_LINKED = '''-- table customers_Sheet1 (relevance 0.230)
CREATE TABLE "customers_Sheet1" (
"id" INTEGER,
  "customer_name" TEXT,
  "region" TEXT
)
example values:
  customer_name: 'Acme Industrial', 'Borealis Logistics'
  region: 'North', 'South'
sample rows: [{"id": 1, "customer_name": "Acme Industrial", "region": "North"}]

-- table orders_Sheet1 (relevance 0.2)
CREATE TABLE "orders_Sheet1" (
"id" INTEGER,
  "customer_id" INTEGER,
  "order_qty" INTEGER
)
sample rows: [{"id": 1, "customer_id": 3, "order_qty": 5}]
'''

NAIVE_DUMP = SCHEMA_LINKED.replace("example values:", "ignored:").split("sample rows:")[0]


def test_author_binds_literal_via_examples_and_joins():
    m = _mod()
    sql = m.ScriptedSqlAuthor().author(
        "How many orders did customer 'Acme Industrial' place?", SCHEMA_LINKED
    )
    assert "COUNT(*)" in sql
    assert "JOIN" in sql and "customer_id" in sql
    assert "customer_name = 'Acme Industrial'" in sql


def test_author_prefers_text_columns_for_string_literals():
    m = _mod()
    # without example values, a quoted string must still bind to a TEXT
    # column, never an INTEGER id column
    sql = m.ScriptedSqlAuthor().author(
        "How many orders did customer 'Zephyr Trading' place?", NAIVE_DUMP
    )
    assert "customer_id = 'Zephyr" not in sql


def test_author_measure_column_best_match():
    m = _mod()
    ctx = SCHEMA_LINKED + '''
-- table product_returns (relevance 0.1)
CREATE TABLE "product_returns" (
"id" INTEGER,
  "return_qty" INTEGER
)
'''
    sql = m.ScriptedSqlAuthor().author(
        "What is the total order quantity for customer 'Acme Industrial'?", ctx
    )
    assert "order_qty" in sql and "return_qty" not in sql


def test_judge_normalizes_multisets():
    m = _mod()
    a = {"columns": ["x"], "rows": [[1], [2]]}
    b = {"columns": ["y"], "rows": [[2], [1]]}
    assert m.normalize_result(a) == m.normalize_result(b)
    assert m.normalize_result({"error": "boom"}) is None


def test_fixtures_committed():
    for suite in ("multi_table", "complex_sheet", "domain_table"):
        p = ROOT / "benchmarks" / "data" / "text2sql" / f"{suite}.json"
        assert p.exists(), f"fixture {suite}.json not committed"


def test_suite_generators_deterministic():
    import numpy as np

    m = _mod()
    for gen in m.SUITES.values():
        t1, q1 = gen(np.random.default_rng(11))
        t2, q2 = gen(np.random.default_rng(11))
        assert q1 == q2
        for k in t1:
            assert t1[k].equals(t2[k])
