#!/usr/bin/env python
"""Schema-linking accuracy — the deterministic core of the reference's
Text2SQL quality rows (`/root/reference/README.md:609-662`: every Text2SQL
benchmark first has to pick the right table) and of DTR multi-sheet
reasoning (`schema_linking.py`). Measures top-1 table/sheet accuracy on a
fixture of multi-table workbooks engineered to break lexical overlap:

- every table shares generic columns (id, name, created_at, status) so
  token overlap piles up on the wrong tables;
- questions use VALUE mentions ("the north region", "engineering
  department") that only appear in the gold table's cells, plus intent
  words absent from any schema.

Paths compared:
  dtr_lexical      — integrations/dtr/smg.link_sheets (token overlap)
  dtr_element      — integrations/dtr/schema_link.ElementIndex (idf-hashed
                     element vectors over sheets/columns/samples)
  text2sql_element — tools/text2sql.schema_link over a KB built through
                     the table processors (table+column element vectors)

Writes benchmarks/schema_link_report.json. Hermetic (hash embedder, CPU).
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "benchmarks")

# table archetypes: (name stem, specific columns, value pool per column)
ARCHETYPES = [
    (
        "orders",
        {"order_total": [120, 80, 310], "region": ["north", "south", "east", "west"],
         "product": ["widget", "gadget", "doohickey"]},
        [
            "total revenue for the north region",
            "which product sells most in the west",
            "average order value by region",
        ],
    ),
    (
        "employees",
        {"salary": [70000, 85000, 92000], "department": ["engineering", "sales", "finance"],
         "title": ["analyst", "manager", "director"]},
        [
            "headcount in the engineering department",
            "average salary of managers",
            "which department pays directors most",
        ],
    ),
    (
        "tickets",
        {"priority": ["low", "medium", "urgent"], "queue": ["billing", "outage", "login"],
         "resolution_hours": [2, 8, 48]},
        [
            "how many urgent tickets in the outage queue",
            "mean resolution hours for billing issues",
            "count tickets by priority",
        ],
    ),
    (
        "shipments",
        {"carrier": ["fedax", "upx", "dhx"], "weight_kg": [1.5, 12.0, 80.0],
         "destination": ["berlin", "osaka", "austin"]},
        [
            "total weight shipped to berlin",
            "which carrier handles osaka deliveries",
            "shipments per destination",
        ],
    ),
]
GENERIC = {"id": [1, 2, 3], "name": ["alpha", "beta", "gamma"],
           "created_at": ["2024-01-01", "2024-06-01"], "status": ["open", "closed"]}

# trap columns: OTHER tables carry columns named with a question's key
# tokens (metadata/annotation columns are common in real workbooks) while
# the data itself lives elsewhere — token overlap piles onto the wrong
# sheet and only value/element evidence disambiguates
TRAPS = {
    "orders": {"priority_note": ["n/a"], "department_code": ["x1"], "carrier_ref": ["-"]},
    "employees": {"region_code": ["r0"], "queue_hint": ["-"], "destination_pref": ["n/a"]},
    "tickets": {"revenue_flag": ["0"], "salary_band": ["-"], "weight_class": ["x"]},
    "shipments": {"order_note": ["-"], "department_tag": ["x"], "resolution_code": ["0"]},
}


def gen_workbooks(n_workbooks: int = 25, traps: bool = True):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    cases = []  # (sheets, question, gold_sheet)
    for w in range(n_workbooks):
        sheets = {}
        for stem, cols, _qs in ARCHETYPES:
            data = {}
            extra = TRAPS[stem] if traps else {}
            for c, pool in {**GENERIC, **cols, **extra}.items():
                data[c] = [pool[int(rng.integers(0, len(pool)))] for _ in range(12)]
            sheets[f"{stem}_{w}"] = pd.DataFrame(data)
        for stem, cols, qs in ARCHETYPES:
            q = qs[int(rng.integers(0, len(qs)))]
            cases.append((sheets, q, f"{stem}_{w}"))
    return cases


def _dtr_accuracy(cases) -> tuple[float, float]:
    from youtu_rag_tpu.integrations.dtr.schema_link import ElementIndex
    from youtu_rag_tpu.integrations.dtr.smg import link_sheets

    lex_hits = el_hits = 0
    index_cache: dict[int, "ElementIndex"] = {}
    for sheets, q, gold in cases:
        ranked = link_sheets(q, sheets, top_n=1)
        lex_hits += bool(ranked and ranked[0][0] == gold)
        idx = index_cache.get(id(sheets))
        if idx is None:
            idx = index_cache[id(sheets)] = ElementIndex(sheets)
        ranked = idx.link(q, top_n=1)
        el_hits += bool(ranked and ranked[0][0] == gold)
    return lex_hits / len(cases), el_hits / len(cases)


async def run(args) -> dict:
    cases = gen_workbooks(args.workbooks)
    report = {"cases": len(cases)}

    # --- DTR linkers: clean fixtures vs trap-column fixtures ---------------
    for label, traps in (("clean", False), ("traps", True)):
        lex, el = _dtr_accuracy(gen_workbooks(args.workbooks, traps=traps))
        report[f"dtr_lexical_top1_{label}"] = round(lex, 4)
        report[f"dtr_element_top1_{label}"] = round(el, 4)

    # --- text2sql element-index link over a built KB -----------------------
    from youtu_rag_tpu.core.config import IndexConfig, RAGConfig, VectorStoreConfig
    from youtu_rag_tpu.ingest.processors import ExcelProcessor, ProcessorContext, SourceTask
    from youtu_rag_tpu.retrieval.kb import KnowledgeBase
    from youtu_rag_tpu.tools.text2sql import Text2SQLToolkit

    sheets0, _, _ = cases[0]
    t2s_hits = 0
    n_t2s = 0
    # one KB per workbook is slow; sample a few workbooks
    for w in range(min(args.workbooks, 6)):
        sheets = cases[w * len(ARCHETYPES)][0]
        rag = RAGConfig(
            vector_store=VectorStoreConfig(
                index=IndexConfig(min_capacity=512, block_rows=64)
            )
        )
        kb = KnowledgeBase(f"sl_{w}", rag)
        ctx = ProcessorContext(f"sl_{w}", kb.store, kb.embedder, kb.tables)
        import pandas as pd
        import tempfile

        for name, df in sheets.items():
            with tempfile.NamedTemporaryFile(suffix=".csv", delete=False) as f:
                df.to_csv(f.name, index=False)
            await ExcelProcessor(ctx).process(SourceTask(f"{name}.csv", "table", path=f.name))
        tk = Text2SQLToolkit({"kb": kb, "tables": kb.tables})
        for stem, _cols, qs in ARCHETYPES:
            for q in qs:
                out = await tk.schema_link(q, top_k=1)
                first = out.split("-- table ", 2)
                picked = first[1].split(" ", 1)[0] if len(first) > 1 else ""
                t2s_hits += picked.startswith(stem)
                n_t2s += 1
    report["text2sql_element_top1"] = round(t2s_hits / max(n_t2s, 1), 4)
    report["text2sql_cases"] = n_t2s
    return report


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--workbooks", type=int, default=25)
    args = p.parse_args()
    report = asyncio.run(run(args))
    print(json.dumps(report))
    out = os.path.join(DATA_DIR, "schema_link_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
