#!/usr/bin/env python
"""End-to-end Text2SQL accuracy benchmark (VERDICT r3 item 3).

Reproduces the *shape* of the reference's flagship text2sql table
(/root/reference/README.md:609-662 — its agent beats a Vanna-style
single-shot baseline on four suites) at committed-fixture scale,
deterministically and offline:

  suites     multi_table_mini  compact 2-table join schema (the
                           reference's "Multi-table-mini" axis);
             multi_table   joins over customers/products/orders + trap
                           tables with overlapping schemas;
             complex_sheet one wide messy inventory sheet (nulls, spaced
                           column names — the "Complex Excel" axis);
             domain_table  domain vocabulary + paraphrased questions
                           (the reference's hardest axis: 27%).
             All suites ≥50 questions (VERDICT r4 item 6).
  systems    naive         single-shot schema-dump prompt → SQL
                           (the Vanna-style baseline row);
             agent         Text2SQLAgent: element-index schema_link →
                           generate (schema + example values) → execute
                           with error retry (tools/text2sql.py);
             agent_memory  the same agent with curated schema knowledge
                           remembered through VectorMemoryToolkit — the
                           only path to the paraphrase questions;
             orchestra     the full `orchestra_react_sql` pipeline on
                           EVERY question (plan → Text2SQLWorkerAgent
                           running the retrying pipeline → report).
  generator  ONE deterministic scripted SQL author (FakeChatClient
             rule_fn) shared by every system — it writes SQL from
             whatever schema context it is shown, so the measured gap is
             the *harness contribution* (linking, example values, retry),
             not generator luck.
  judge      execute gold SQL vs predicted SQL on the same TableStore and
             compare normalized result multisets.

Run:  python scripts/bench_text2sql.py
Writes benchmarks/data/text2sql/*.json + benchmarks/text2sql_report.json.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchmarks", "data", "text2sql",
)

_FIRST = ["Acme", "Borealis", "Cardinal", "Dynamo", "Everest", "Fulcrum",
          "Granite", "Harbor", "Ionic", "Juniper", "Keystone", "Lumen",
          "Meridian", "Nimbus", "Orchard", "Pinnacle", "Quarry", "Rampart",
          "Summit", "Tundra"]
_KIND = ["Industrial", "Logistics", "Manufacturing", "Supply", "Trading"]


def gen_multi_table(rng) -> tuple[dict[str, pd.DataFrame], list[dict]]:
    regions = ["North", "South", "East", "West"]
    segments = ["retail", "wholesale", "public"]
    categories = ["filters", "pumps", "valves", "sensors"]

    customers = pd.DataFrame({
        "id": range(1, 21),
        "customer_name": [f"{_FIRST[i]} {_KIND[i % 5]}" for i in range(20)],
        "region": [regions[int(rng.integers(0, 4))] for _ in range(20)],
        "segment": [segments[int(rng.integers(0, 3))] for _ in range(20)],
    })
    products = pd.DataFrame({
        "id": range(1, 13),
        "product_name": [f"{categories[i % 4].rstrip('s').title()} Unit {chr(65 + i)}{i}" for i in range(12)],
        "category": [categories[i % 4] for i in range(12)],
        "unit_price": [float(rng.integers(20, 900)) for _ in range(12)],
    })
    orders = pd.DataFrame({
        "id": range(1, 201),
        "customer_id": [int(rng.integers(1, 21)) for _ in range(200)],
        "product_id": [int(rng.integers(1, 13)) for _ in range(200)],
        "order_qty": [int(rng.integers(1, 50)) for _ in range(200)],
        "status": [["open", "shipped", "returned"][int(rng.integers(0, 3))] for _ in range(200)],
    })
    # trap tables: same column vocabulary, stale/disjoint values — a naive
    # schema dump cannot tell them apart; the element index can (its column
    # vectors embed the live values)
    customer_archive = pd.DataFrame({
        "id": range(1, 11),
        "customer_name": [f"Old {_FIRST[-(i + 1)]} Works" for i in range(10)],
        "region": ["Defunct"] * 10,
        "segment": ["archived"] * 10,
    })
    product_returns = pd.DataFrame({
        "id": range(1, 9),
        "product_name": [f"Retired Unit R{i}" for i in range(8)],
        "return_qty": [int(rng.integers(1, 9)) for _ in range(8)],
    })
    tables = {
        "customers": customers, "products": products, "orders": orders,
        "customer_archive": customer_archive, "product_returns": product_returns,
    }

    qs: list[dict] = []
    for i in range(20):  # every customer: join + count
        name = customers.customer_name[i]
        qs.append({
            "question": f"How many orders did customer '{name}' place?",
            "gold": "SELECT COUNT(*) FROM {orders} o JOIN {customers} c "
                    f"ON o.customer_id = c.id WHERE c.customer_name = '{name}'",
        })
    for i in range(12):  # every product: join + SUM
        pname = products.product_name[i]
        qs.append({
            "question": f"What is the total order quantity for product '{pname}'?",
            "gold": "SELECT SUM(o.order_qty) FROM {orders} o JOIN {products} p "
                    f"ON o.product_id = p.id WHERE p.product_name = '{pname}'",
        })
    for i in range(12):  # every product: plain lookup
        pname = products.product_name[i]
        qs.append({
            "question": f"What is the unit price of product '{pname}'?",
            "gold": "SELECT unit_price FROM {products} "
                    f"WHERE product_name = '{pname}'",
        })
    for r in regions:
        qs.append({
            "question": f"How many customers are in the '{r}' region?",
            "gold": "SELECT COUNT(*) FROM {customers} " + f"WHERE region = '{r}'",
        })
    for s in segments:
        qs.append({
            "question": f"How many customers are in the '{s}' segment?",
            "gold": "SELECT COUNT(*) FROM {customers} " + f"WHERE segment = '{s}'",
        })
    for s in ("open", "shipped", "returned"):
        qs.append({
            "question": f"What is the total order quantity with status '{s}'?",
            "gold": "SELECT SUM(order_qty) FROM {orders} " + f"WHERE status = '{s}'",
        })
    qs.append({  # group-by head: beyond the scripted author on purpose
        "question": "Which product category has the highest total order quantity?",
        "gold": "SELECT p.category FROM {orders} o JOIN {products} p ON "
                "o.product_id = p.id GROUP BY p.category "
                "ORDER BY SUM(o.order_qty) DESC LIMIT 1",
    })
    return tables, qs


def gen_multi_table_mini(rng) -> tuple[dict[str, pd.DataFrame], list[dict]]:
    """Compact 2-table join schema — mirrors the reference's 4th suite
    ('Multi-table-mini', /root/reference/README.md:609-662)."""
    dept_names = ["Logistics", "Research", "Finance", "Assembly", "Quality", "Dispatch"]
    roles = ["engineer", "analyst", "operator", "supervisor"]
    departments = pd.DataFrame({
        "id": range(1, 7),
        "department_name": dept_names,
        "floor_number": [int(rng.integers(1, 9)) for _ in range(6)],
    })
    n = 40
    employees = pd.DataFrame({
        "id": range(1, n + 1),
        "employee_name": [f"{_FIRST[i % 20]} {chr(65 + i % 26)}." for i in range(n)],
        "department_id": [int(rng.integers(1, 7)) for _ in range(n)],
        "role": [roles[int(rng.integers(0, 4))] for _ in range(n)],
        "salary": [float(rng.integers(38, 160)) * 1000 for _ in range(n)],
        "hire_year": [int(rng.integers(2005, 2026)) for _ in range(n)],
    })
    tables = {"departments": departments, "employees": employees}
    qs: list[dict] = []
    for i in range(0, n, 3):  # 14 salary lookups
        name = employees.employee_name[i]
        qs.append({
            "question": f"What is the salary of employee '{name}'?",
            "gold": "SELECT salary FROM {employees} " + f"WHERE employee_name = '{name}'",
        })
    for i in range(1, n, 7):  # 6 hire-year lookups
        name = employees.employee_name[i]
        qs.append({
            "question": f"What is the hire year of employee '{name}'?",
            "gold": "SELECT hire_year FROM {employees} " + f"WHERE employee_name = '{name}'",
        })
    for d in dept_names:  # join count / SUM / AVG per department
        qs.append({
            "question": f"How many employees are in the '{d}' department?",
            "gold": "SELECT COUNT(*) FROM {employees} e JOIN {departments} d "
                    f"ON e.department_id = d.id WHERE d.department_name = '{d}'",
        })
        qs.append({
            "question": f"What is the total salary for the '{d}' department?",
            "gold": "SELECT SUM(e.salary) FROM {employees} e JOIN {departments} d "
                    f"ON e.department_id = d.id WHERE d.department_name = '{d}'",
        })
        qs.append({
            "question": f"What is the average salary for the '{d}' department?",
            "gold": "SELECT AVG(e.salary) FROM {employees} e JOIN {departments} d "
                    f"ON e.department_id = d.id WHERE d.department_name = '{d}'",
        })
    for d in dept_names[:4]:  # floor lookups
        qs.append({
            "question": f"What is the floor number of the '{d}' department?",
            "gold": "SELECT floor_number FROM {departments} "
                    f"WHERE department_name = '{d}'",
        })
    for r in roles:
        qs.append({
            "question": f"How many employees have the role '{r}'?",
            "gold": "SELECT COUNT(*) FROM {employees} " + f"WHERE role = '{r}'",
        })
        qs.append({
            "question": f"What is the average salary of employees with role '{r}'?",
            "gold": "SELECT AVG(salary) FROM {employees} " + f"WHERE role = '{r}'",
        })
    qs.append({
        "question": "Which employee has the highest salary?",
        "gold": "SELECT employee_name FROM {employees} ORDER BY salary DESC LIMIT 1",
    })
    return tables, qs


def gen_complex_sheet(rng) -> tuple[dict[str, pd.DataFrame], list[dict]]:
    warehouses = ["Dockside", "Ridgeline", "Central"]
    categories = ["fasteners", "adhesives", "abrasives", "coatings"]
    n = 80
    items = pd.DataFrame({
        "item_name": [f"{categories[i % 4].rstrip('s').title()} Stock {i:03d}" for i in range(n)],
        "category": [categories[int(rng.integers(0, 4))] for _ in range(n)],
        "warehouse": [warehouses[int(rng.integers(0, 3))] for _ in range(n)],
        "qty_on_hand": [int(rng.integers(0, 500)) for _ in range(n)],
        "unit_cost": [round(float(rng.uniform(0.5, 80.0)), 2) for _ in range(n)],
        "status": [["active", "discontinued", None][int(rng.integers(0, 3))] for _ in range(n)],
    })
    tables = {"inventory_sheet": items}
    qs: list[dict] = []
    for w in warehouses:
        qs.append({
            "question": f"What is the total quantity on hand in warehouse '{w}'?",
            "gold": "SELECT SUM(qty_on_hand) FROM {inventory_sheet} " + f"WHERE warehouse = '{w}'",
        })
        qs.append({
            "question": f"What is the average unit cost in warehouse '{w}'?",
            "gold": "SELECT AVG(unit_cost) FROM {inventory_sheet} " + f"WHERE warehouse = '{w}'",
        })
    for c in categories:
        qs.append({
            "question": f"What is the average unit cost of '{c}' items?",
            "gold": "SELECT AVG(unit_cost) FROM {inventory_sheet} " + f"WHERE category = '{c}'",
        })
        qs.append({
            "question": f"What is the total quantity on hand of '{c}' items?",
            "gold": "SELECT SUM(qty_on_hand) FROM {inventory_sheet} " + f"WHERE category = '{c}'",
        })
    for w in warehouses:  # 12 two-predicate counts
        for c in categories:
            qs.append({
                "question": f"How many items does warehouse '{w}' stock in category '{c}'?",
                "gold": "SELECT COUNT(*) FROM {inventory_sheet} "
                        f"WHERE warehouse = '{w}' AND category = '{c}'",
            })
    for s in ("active", "discontinued"):
        qs.append({
            "question": f"How many items are in status '{s}'?",
            "gold": "SELECT COUNT(*) FROM {inventory_sheet} " + f"WHERE status = '{s}'",
        })
    for w in warehouses:
        qs.append({
            "question": f"How many items are stored in warehouse '{w}'?",
            "gold": "SELECT COUNT(*) FROM {inventory_sheet} " + f"WHERE warehouse = '{w}'",
        })
    for c in categories:
        qs.append({
            "question": f"How many items are in category '{c}'?",
            "gold": "SELECT COUNT(*) FROM {inventory_sheet} " + f"WHERE category = '{c}'",
        })
    for i in range(0, n, 8):  # 10 per-item qty lookups
        name = items.item_name[i]
        qs.append({
            "question": f"What is the quantity on hand of item '{name}'?",
            "gold": "SELECT qty_on_hand FROM {inventory_sheet} "
                    f"WHERE item_name = '{name}'",
        })
    for i in range(3, n, 13):  # 6 per-item cost lookups
        name = items.item_name[i]
        qs.append({
            "question": f"What is the unit cost of item '{name}'?",
            "gold": "SELECT unit_cost FROM {inventory_sheet} "
                    f"WHERE item_name = '{name}'",
        })
    qs.append({
        "question": "Which item has the highest quantity on hand?",
        "gold": "SELECT item_name FROM {inventory_sheet} ORDER BY qty_on_hand DESC LIMIT 1",
    })
    return tables, qs


def gen_domain_table(rng) -> tuple[dict[str, pd.DataFrame], list[dict]]:
    regions = ["Svalbard", "Andes", "Karakoram"]
    n = 24
    st = pd.DataFrame({
        "station_code": [f"GL-{100 + i}" for i in range(n)],
        "region": [regions[i % 3] for i in range(n)],
        "elevation_m": [int(rng.integers(800, 5200)) for _ in range(n)],
        "mass_balance_mm": [int(rng.integers(-2200, 400)) for _ in range(n)],
        "surveys_count": [int(rng.integers(1, 14)) for _ in range(n)],
    })
    tables = {"glacier_stations": st}
    qs: list[dict] = []
    for i in range(0, n, 2):  # 12 mass-balance lookups
        code = st.station_code[i]
        qs.append({
            "question": f"What is the mass balance recorded at station '{code}'?",
            "gold": "SELECT mass_balance_mm FROM {glacier_stations} "
                    f"WHERE station_code = '{code}'",
        })
    for i in range(1, n, 3):  # 8 elevation lookups
        code = st.station_code[i]
        qs.append({
            "question": f"What is the elevation of station '{code}'?",
            "gold": "SELECT elevation_m FROM {glacier_stations} "
                    f"WHERE station_code = '{code}'",
        })
    for r in regions:
        qs.append({
            "question": f"What is the average elevation of stations in region '{r}'?",
            "gold": "SELECT AVG(elevation_m) FROM {glacier_stations} " + f"WHERE region = '{r}'",
        })
        qs.append({
            "question": f"What is the average mass balance of stations in region '{r}'?",
            "gold": "SELECT AVG(mass_balance_mm) FROM {glacier_stations} "
                    f"WHERE region = '{r}'",
        })
    # paraphrases without lexical column anchors — the reference's domain
    # axis is hard for exactly this reason (its own score: 27%)
    for i in range(0, n, 2):  # 12 "net ice change" paraphrases
        code = st.station_code[i]
        qs.append({
            "question": f"What net ice change was measured at '{code}'?",
            "gold": "SELECT mass_balance_mm FROM {glacier_stations} "
                    f"WHERE station_code = '{code}'",
        })
    for i in range(1, n, 2):  # 12 "field campaigns" paraphrases
        code = st.station_code[i]
        qs.append({
            "question": f"How many field campaigns were logged for '{code}'?",
            "gold": "SELECT surveys_count FROM {glacier_stations} "
                    f"WHERE station_code = '{code}'",
        })
    return tables, qs


SUITES = {
    "multi_table_mini": gen_multi_table_mini,
    "complex_sheet": gen_complex_sheet,
    "multi_table": gen_multi_table,
    "domain_table": gen_domain_table,
}

# Curated schema knowledge a domain expert would store through the memory
# toolkit (ref: memory_toolkit.py:1540-1590 schema-knowledge memories).
# The `text2sql_agent_memory` system runs with these remembered; the
# paraphrase questions (zero lexical overlap with column names) are only
# reachable through them.
SUITE_KNOWLEDGE: dict[str, list[tuple[str, list[str], str]]] = {
    "domain_table": [(
        "glacier_stations",
        [
            "mass_balance_mm: INTEGER (net ice change measured at the station, in millimeters)",
            "surveys_count: INTEGER (number of field campaigns logged at the station)",
            "elevation_m: INTEGER (station elevation in meters)",
        ],
        "Glacier monitoring stations with annual mass-balance measurements",
    )],
    "complex_sheet": [(
        "inventory_sheet",
        [
            "qty_on_hand: INTEGER (stock level, units currently stored)",
            "unit_cost: REAL (cost per unit in credits)",
        ],
        "Warehouse inventory sheet",
    )],
}


# ------------------------------------------------------------------ scripted SQL author

_SYNONYMS = {
    "quantity": ["qty", "quantity"],
    "qty": ["qty", "quantity"],
    "price": ["price"],
    "cost": ["cost"],
    "orders": ["order", "orders"],
    "elevation": ["elevation"],
    "balance": ["balance"],
}

_STOP = {"the", "a", "an", "of", "for", "in", "on", "at", "is", "are", "what",
         "which", "how", "many", "much", "did", "does", "with", "to", "was",
         "were", "and", "'", "items", "item"}


def _words(text: str) -> list[str]:
    return [w for w in re.findall(r"[a-z0-9_]+", text.lower()) if w not in _STOP]


def _col_tokens(col: str) -> set[str]:
    return set(col.lower().split("_"))


def _match_col(
    cols: list[str], qwords: list[str], hints: dict[str, set[str]] | None = None
) -> tuple[str | None, int]:
    """Best column for the measure words via token overlap (+synonyms).

    ``hints`` maps column → extra descriptive tokens harvested from the
    prompt's "-- remembered schema knowledge" block (the memory system's
    contribution): a paraphrase like "net ice change" can only reach
    ``mass_balance_mm`` through those remembered words."""
    best, best_s = None, 0
    expanded: set[str] = set()
    for w in qwords:
        expanded.add(w)
        expanded.update(_SYNONYMS.get(w, ()))
    for col in cols:
        toks = _col_tokens(col) | (hints or {}).get(col, set())
        s = len(toks & expanded)
        if s > best_s:
            best, best_s = col, s
    return best, best_s


class ScriptedSqlAuthor:
    """Deterministic SQL author driving every benchmark system.

    It writes SELECTs from ONLY what the prompt shows it: table DDLs, and
    (when the harness provides them) per-column example values that let a
    quoted literal bind to the right column/table. It never sees the gold
    SQL or the fixture generators."""

    def parse_context(self, prompt: str) -> dict:
        tables: dict[str, dict] = {}
        # segment per "-- table X" block when present (schema_link output);
        # otherwise the whole prompt is one anonymous schema dump
        blocks = re.split(r"(?m)^-- table (\w+).*$", prompt)
        segments: list[tuple[str | None, str]] = []
        if len(blocks) > 1:
            for i in range(1, len(blocks), 2):
                segments.append((blocks[i], blocks[i + 1]))
        else:
            segments.append((None, prompt))
        for _, seg in segments:
            for m in re.finditer(r'CREATE TABLE "?([\w]+)"?\s*\((.*?)\)', seg, re.S):
                cols, types = [], {}
                for part in m.group(2).split(","):
                    tok = part.strip().split()
                    if tok:
                        name = tok[0].strip('"')
                        cols.append(name)
                        types[name] = (tok[1].upper() if len(tok) > 1 else "")
                entry = tables.setdefault(
                    m.group(1), {"columns": cols, "examples": {}, "types": types}
                )
                entry["columns"] = cols
                entry["types"] = types
            seg_tables = [m.group(1) for m in re.finditer(r'CREATE TABLE "?([\w]+)"?', seg)]
            for em in re.finditer(r"^\s{2}(\w+): (.+)$", seg, re.M):
                vals = re.findall(r"'([^']*)'", em.group(2))
                for t in seg_tables:
                    tables[t]["examples"].setdefault(em.group(1), set()).update(vals)
            # sample rows carry values the top-N example lists may miss
            for sm in re.finditer(r"sample rows: (\[.*?\])$", seg, re.M):
                try:
                    rows = json.loads(sm.group(1))
                except json.JSONDecodeError:
                    continue
                for t in seg_tables:
                    for row in rows:
                        for col, v in row.items():
                            if isinstance(v, str):
                                tables[t]["examples"].setdefault(col, set()).add(v)
        return tables

    def parse_hints(self, prompt: str) -> dict[str, set[str]]:
        """column → descriptive tokens from remembered schema knowledge
        (the '-- remembered schema knowledge' block schema_link appends when
        a memory toolkit is wired — ref memory_toolkit.py:1540-1590)."""
        hints: dict[str, set[str]] = {}
        for seg in prompt.split("-- remembered schema knowledge")[1:]:
            for m in re.finditer(r"^\s*- (\w+): (.+)$", seg, re.M):
                hints.setdefault(m.group(1), set()).update(_words(m.group(2)))
        return hints

    def author(self, question: str, prompt: str, banned: set[str] = frozenset()) -> str:
        tables = self.parse_context(prompt)
        hints = self.parse_hints(prompt)
        if not tables:
            return "SELECT 1;"
        q = question
        qwords = _words(q)
        literals = re.findall(r"'([^']+)'", q)

        def bind_literal(lit: str) -> tuple[str, str] | None:
            """(table, column) for a quoted literal via example values."""
            for t, info in tables.items():
                for col, vals in info["examples"].items():
                    if lit in vals and col not in banned:
                        return t, col
            return None

        # table scoring: name/column overlap + literal-binding bonus
        def score(t: str) -> float:
            info = tables[t]
            toks = set(_words(t.replace("_", " ")))
            for c in info["columns"]:
                toks |= _col_tokens(c)
            s = float(len(toks & set(qwords)))
            for lit in literals:
                for col, vals in info["examples"].items():
                    if lit in vals:
                        s += 5.0
            return s

        # WHERE clauses
        wheres: list[tuple[str, str, str]] = []  # (table, col, literal)
        for lit in literals:
            bound = bind_literal(lit)
            if bound:
                wheres.append((bound[0], bound[1], lit))
                continue
            # no example values: guess by the words right before the quote;
            # a quoted string can only live in a TEXT column (DDL types)
            pre = q.lower().split(f"'{lit.lower()}'")[0]
            prewords = _words(pre)[-2:]
            cands = sorted(tables, key=score, reverse=True)

            def text_cols(t: str) -> list[str]:
                cols = [c for c in tables[t]["columns"] if c not in banned]
                typed = [c for c in cols if "TEXT" in tables[t]["types"].get(c, "")
                         or "CHAR" in tables[t]["types"].get(c, "")]
                return typed or cols

            chosen = None
            for t in cands:
                col, s = _match_col(text_cols(t), prewords)
                if col and s > 0:
                    chosen = (t, col, lit)
                    break
            if chosen is None:
                t = cands[0]
                named = [c for c in text_cols(t)
                         if "name" in c or "region" in c or "status" in c]
                chosen = (t, (named or text_cols(t))[0], lit)
            wheres.append(chosen)

        ql = q.lower()
        # measure/aggregation intent
        agg, measure_words = None, []
        m = re.search(r"total ([\w ]+?)(?: for | with | in |\?|$)", ql)
        if m:
            agg, measure_words = "SUM", _words(m.group(1))
        m = re.search(r"average ([\w ]+?)(?: of | for | in |\?|$)", ql)
        if m:
            agg, measure_words = "AVG", _words(m.group(1))
        if re.search(r"how many", ql) and not agg:
            # "how many <entity>" → COUNT over the table holding the wheres
            agg = "COUNT"
        superlative = re.search(r"(highest|most|largest|maximum) ([\w ]+?)(?:\?|$)", ql)

        # choose the primary table: where-bound table with the measure col,
        # else best-scoring
        ranked = sorted(tables, key=score, reverse=True)
        primary = wheres[0][0] if wheres else ranked[0]

        def fk_join(a: str, b: str) -> str | None:
            """a.<singular(base(b))>_id = b.id naming-convention join
            (base() drops ingest suffixes like _Sheet1)."""
            base = re.sub(r"_sheet\d+$", "", b, flags=re.I)
            fk = f"{base.rstrip('s')}_id"
            if fk in tables[a]["columns"] and "id" in tables[b]["columns"]:
                return f'FROM "{a}" JOIN "{b}" ON "{a}".{fk} = "{b}".id'
            return None

        if superlative:
            mcol, _ = _match_col(tables[primary]["columns"], _words(superlative.group(2)), hints)
            if mcol:
                key = next((c for c in tables[primary]["columns"] if "name" in c),
                           tables[primary]["columns"][0])
                return (f'SELECT {key} FROM "{primary}" '
                        f"ORDER BY {mcol} DESC LIMIT 1;")

        if agg in ("SUM", "AVG"):
            # the measure column may live in a different table than the
            # bound literal → join over the id convention. Pick the BEST
            # (overlap, table-relevance) match across every visible table,
            # not the first hit in rank order.
            mtab, mcol, best = None, None, (0, -1.0)
            for rank_i, t in enumerate(ranked):
                c, s = _match_col(
                    [c for c in tables[t]["columns"] if c not in banned],
                    measure_words,
                    hints,
                )
                if c and (s, -rank_i) > best:
                    mtab, mcol, best = t, c, (s, -rank_i)
            if mcol is None:
                return "SELECT 1;"
            conds, join = [], None
            for (wt, wc, lit) in wheres:
                if wt == mtab:
                    conds.append(f'"{mtab}".{wc} = \'{lit}\'')
                else:
                    join = fk_join(mtab, wt)
                    if join:
                        conds.append(f'"{wt}".{wc} = \'{lit}\'')
            frm = join or f'FROM "{mtab}"'
            where = (" WHERE " + " AND ".join(conds)) if conds else ""
            return f'SELECT {agg}("{mtab}".{mcol}) {frm}{where};'

        if agg == "COUNT":
            # "how many X were logged/recorded" may be a LOOKUP of a
            # count-valued column, not a row count — only remembered schema
            # knowledge (hints) can make that call for paraphrased X
            m3 = re.search(r"how many ([\w ]+?) (?:were|was) (?:logged|recorded|measured)", ql)
            if m3:
                for t in [w[0] for w in wheres] + ranked:
                    col, s = _match_col(
                        [c for c in tables[t]["columns"] if c not in banned],
                        _words(m3.group(1)), hints,
                    )
                    if col and s > 0:
                        conds = [f"{wc} = '{lit}'" for (wt, wc, lit) in wheres if wt == t]
                        where = (" WHERE " + " AND ".join(conds)) if conds else ""
                        return f'SELECT {col} FROM "{t}"{where};'
            # count rows of the entity table implied by the question
            ent = None
            for t in ranked:
                if set(_words(t.replace("_", " "))) & set(qwords):
                    ent = t
                    break
            ent = ent or primary
            conds, join = [], None
            for (wt, wc, lit) in wheres:
                if wt == ent:
                    conds.append(f'"{ent}".{wc} = \'{lit}\'')
                else:
                    join = fk_join(ent, wt)
                    if join:
                        conds.append(f'"{wt}".{wc} = \'{lit}\'')
            frm = join or f'FROM "{ent}"'
            where = (" WHERE " + " AND ".join(conds)) if conds else ""
            return f"SELECT COUNT(*) {frm}{where};"

        # plain lookup: "what is the X of/at/for 'V'"
        m = re.search(r"what (?:is|was) the ([\w ]+?)(?: of | for | at | recorded| measured|\?)", ql) \
            or re.search(r"what ([\w ]+?) (?:was|is) (?:measured|recorded|logged)", ql) \
            or re.search(r"how many ([\w ]+?) were logged", ql)
        target_words = _words(m.group(1)) if m else qwords
        for t in [w[0] for w in wheres] + ranked:
            col, _s = _match_col([c for c in tables[t]["columns"] if c not in banned],
                                 target_words, hints)
            if col:
                conds = [f"{wc} = '{lit}'" for (wt, wc, lit) in wheres if wt == t]
                where = (" WHERE " + " AND ".join(conds)) if conds else ""
                return f'SELECT {col} FROM "{t}"{where};'
        return "SELECT 1;"


# ------------------------------------------------------------------ judge

def normalize_result(res: dict) -> tuple | None:
    if not isinstance(res, dict) or "rows" not in res:
        return None
    vals = []
    for row in res["rows"]:
        cells = tuple(
            (f"{c:.4f}" if isinstance(c, float) else str(c)) for c in row
        )
        vals.append(cells if len(cells) > 1 else cells[0])
    return tuple(sorted(map(str, vals)))


def judge(store, gold_sql: str, pred_result: dict) -> bool:
    gold = normalize_result(store.execute_sql(gold_sql))
    pred = normalize_result(pred_result)
    return gold is not None and pred is not None and gold == pred


# ------------------------------------------------------------------ harness

NAIVE_PROMPT = """You translate questions into SQLite SELECT statements.

Database schema:
{schema}

Question: {question}
Reply with the SQL statement only (no markdown fences)."""


async def build_suite_kb(suite: str, tables: dict[str, pd.DataFrame], tmp: str):
    from youtu_rag_tpu.core.config import IndexConfig, RAGConfig, VectorStoreConfig
    from youtu_rag_tpu.ingest.agent import BuildRequest, KnowledgeBuilderAgent
    from youtu_rag_tpu.ingest.processors import SourceTask
    from youtu_rag_tpu.retrieval.kb import KnowledgeBase

    cfg = RAGConfig(vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=512, block_rows=128)))
    kb = KnowledgeBase(f"t2s_{suite}", cfg)
    agent = KnowledgeBuilderAgent(kb.name, kb.store, kb.embedder)
    tasks = []
    for name, df in tables.items():
        path = os.path.join(tmp, f"{name}.csv")
        df.to_csv(path, index=False)
        tasks.append(SourceTask(f"{name}.csv", "table", path=path))
    report = await agent.build(BuildRequest(kb_name=kb.name, tasks=tasks))
    name_map = {}  # logical name -> registered table name
    for t in report.tables:
        logical = t.split("__")[-1] if "__" in t else t
        for want in tables:
            if want in t:
                name_map[want] = t
    return kb, agent, name_map


def make_rule_fn(author: ScriptedSqlAuthor, state: dict):
    """FakeChatClient rule covering every prompt the systems emit."""
    from youtu_rag_tpu.agents.llm import FakeChatClient

    def rule(messages, tools):
        content = (messages[-1].content or "") if messages else ""
        sys_prompt = (messages[0].content or "") if messages else ""
        if "task planner" in sys_prompt or "task planner" in content:
            q = state["question"].replace('"', "'")
            return FakeChatClient.text_response(
                "<analysis>structured-data question → text2sql worker</analysis>"
                f'<plan>[{{"agent_name": "text2sql", "task": "{q}"}}]</plan>'
            )
        if content.startswith("You are a reporter") or "Trajectory:" in content:
            return FakeChatClient.text_response(state.get("last_answer", "done"))
        if content.startswith("You translate questions"):
            sql = author.author(state["question"], content, state.get("banned", set()))
            if "The previous attempt failed" in content:
                m = re.search(r"no such column: (\w+)", content)
                if m:
                    state.setdefault("banned", set()).add(m.group(1))
                    sql = author.author(state["question"], content, state["banned"])
            state["last_sql"] = sql
            return FakeChatClient.text_response(sql)
        if content.startswith("Answer the question"):
            m = re.search(r"Result: (.*)", content, re.S)
            state["last_answer"] = (m.group(1)[:200] if m else "no result")
            return FakeChatClient.text_response(state["last_answer"])
        # SimpleAgent tool loop (the orchestra worker): schema_link →
        # execute_sql → answer, keyed on what has already happened
        if tools:
            tool_msgs = [m for m in messages if m.role == "tool"]
            if not tool_msgs:
                return FakeChatClient.tool_response(
                    "schema_link", {"query": state["question"]}
                )
            if len(tool_msgs) == 1:
                sql = author.author(state["question"], tool_msgs[0].content or "")
                state["last_sql"] = sql
                return FakeChatClient.tool_response("execute_sql", {"sql": sql})
            state["last_answer"] = (tool_msgs[-1].content or "")[:200]
            return FakeChatClient.text_response(state["last_answer"])
        return FakeChatClient.text_response("?")

    return rule


async def run_suite(suite: str, gen, tmp: str, orchestra_subset: int) -> dict:
    from youtu_rag_tpu.agents.config import AgentConfig
    from youtu_rag_tpu.agents.llm import FakeChatClient
    from youtu_rag_tpu.agents.llm_agent import LLMAgent
    from youtu_rag_tpu.tools.base import ToolkitConfig
    from youtu_rag_tpu.tools.text2sql import Text2SQLAgent, Text2SQLToolkit

    rng = np.random.default_rng(11)
    tables, questions = gen(rng)
    kb, agent, name_map = await build_suite_kb(suite, tables, tmp)
    store = agent.tables

    def gold_sql(q: dict) -> str:
        sql = q["gold"]
        for logical, actual in name_map.items():
            sql = sql.replace("{" + logical + "}", f'"{actual}"')
        return sql

    author = ScriptedSqlAuthor()
    toolkit = Text2SQLToolkit(ToolkitConfig(config={"kb": kb, "tables": store}))

    # full-dump naive context (all tables, no examples, no relevance)
    dump = "\n\n".join(store.get_schema(t) for t in sorted(
        r["table_name"] for r in store.tables_for_kb(kb.name)
    ))

    out = {"suite": suite, "questions": len(questions), "systems": {}}
    naive_ok = agent_ok = 0
    per_q = []
    for q in questions:
        gold = gold_sql(q)
        # --- naive single-shot ---
        naive_sql = author.author(q["question"], NAIVE_PROMPT.format(schema=dump, question=q["question"]))
        naive_res = store.execute_sql(naive_sql)
        n_ok = judge(store, gold, naive_res)
        naive_ok += n_ok

        # --- text2sql agent (link + examples + retry) ---
        state = {"question": q["question"]}
        llm = LLMAgent(client=FakeChatClient(rule_fn=make_rule_fn(author, state)))
        t2s = Text2SQLAgent(toolkit, llm, learn_patterns=False)
        r = await t2s.text2sql(q["question"])
        a_ok = judge(store, gold, r["result"])
        agent_ok += a_ok
        per_q.append({
            "question": q["question"], "gold": gold,
            "naive_sql": naive_sql, "naive_ok": bool(n_ok),
            "agent_sql": r["sql"], "agent_ok": bool(a_ok),
        })
    out["systems"]["naive_single_shot"] = round(naive_ok / len(questions), 4)
    out["systems"]["text2sql_agent"] = round(agent_ok / len(questions), 4)

    # --- agent + remembered schema knowledge (the memory contribution) ---
    from youtu_rag_tpu.memory.toolkit import VectorMemoryToolkit

    memory = VectorMemoryToolkit({"user_id": f"t2s_{suite}"})
    for tname, cols, desc in SUITE_KNOWLEDGE.get(suite, []):
        await memory.store_schema_knowledge(
            table_name=tname, columns=cols, description=desc
        )
    mem_toolkit = Text2SQLToolkit(
        ToolkitConfig(config={"kb": kb, "tables": store, "memory": memory})
    )
    mem_ok = 0
    for q in questions:
        state = {"question": q["question"]}
        llm = LLMAgent(client=FakeChatClient(rule_fn=make_rule_fn(author, state)))
        t2s = Text2SQLAgent(mem_toolkit, llm, learn_patterns=False)
        r = await t2s.text2sql(q["question"])
        mem_ok += judge(store, gold_sql(q), r["result"])
    out["systems"]["text2sql_agent_memory"] = round(mem_ok / len(questions), 4)

    # --- orchestra_react_sql end-to-end (full n by default; the pipeline's
    # worker now runs the same retrying Text2SQLAgent the bare system does) ---
    from youtu_rag_tpu.agents.factory import get_agent

    orch_ok = 0
    subset = questions if orchestra_subset <= 0 else questions[:orchestra_subset]
    for q in subset:
        state = {"question": q["question"]}
        client = FakeChatClient(rule_fn=make_rule_fn(author, state))
        cfg = AgentConfig(type="orchestra_react_sql")
        cfg.toolkits["text2sql"] = ToolkitConfig(
            name="text2sql", config={"kb": kb, "tables": store}
        )
        orch = get_agent(cfg, client=client)
        await orch.run(q["question"])
        res = store.execute_sql(state.get("last_sql", "SELECT 0;"))
        orch_ok += judge(store, gold_sql(q), res)
    if subset:
        out["systems"]["orchestra_react_sql"] = round(orch_ok / len(subset), 4)
        out["orchestra_subset"] = len(subset)
    out["per_question"] = per_q
    return out


def write_fixtures(suites_data: dict) -> None:
    os.makedirs(DATA_DIR, exist_ok=True)
    for suite, gen in SUITES.items():
        rng = np.random.default_rng(11)
        tables, questions = gen(rng)
        fx = {
            "tables": {n: df.to_dict(orient="list") for n, df in tables.items()},
            "questions": questions,
        }
        with open(os.path.join(DATA_DIR, f"{suite}.json"), "w") as f:
            json.dump(fx, f, ensure_ascii=False, indent=1)


async def main_async(args) -> dict:
    import tempfile

    write_fixtures(SUITES)
    report = {"suites": []}
    with tempfile.TemporaryDirectory(prefix="yrt-t2s-") as tmp:
        for suite, gen in SUITES.items():
            print(f"suite {suite} ...", file=sys.stderr, flush=True)
            report["suites"].append(
                await run_suite(suite, gen, tmp, args.orchestra_subset)
            )
    return report


def main() -> None:
    from youtu_rag_tpu.utils.provenance import run_provenance

    p = argparse.ArgumentParser()
    p.add_argument("--orchestra-subset", type=int, default=0,
                   help="0 = run the full pipeline on every question")
    args = p.parse_args()
    report = asyncio.run(main_async(args))
    report.update(run_provenance(seed=11))
    slim = {
        "suites": [
            {k: v for k, v in s.items() if k != "per_question"}
            for s in report["suites"]
        ]
    }
    print(json.dumps(slim))
    out = os.path.join(os.path.dirname(DATA_DIR), "..", "text2sql_report.json")
    with open(os.path.abspath(out), "w") as f:
        f.write(json.dumps(report, indent=1) + "\n")
    print(f"wrote {os.path.abspath(out)}", file=sys.stderr)


if __name__ == "__main__":
    main()
