#!/usr/bin/env python
"""Dump / clear the trajectory+trace database
(ref: scripts db dump/clear utilities).

    python scripts/db_dump.py --db sqlite:///data/yrt.db [--table trajectories]
    python scripts/db_dump.py --db sqlite:///data/yrt.db --clear evaluation_samples
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from youtu_rag_tpu.db.models import (  # noqa: E402
    EvaluationSample,
    GenerationTraceRecord,
    ToolTraceRecord,
    TrajectoryRecord,
)
from youtu_rag_tpu.db.service import DBService  # noqa: E402

TABLES = {
    "trajectories": TrajectoryRecord,
    "tool_traces": ToolTraceRecord,
    "generation_traces": GenerationTraceRecord,
    "evaluation_samples": EvaluationSample,
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--db", required=True)
    p.add_argument("--table", default=None, choices=[*TABLES, None])
    p.add_argument("--limit", type=int, default=50)
    p.add_argument("--clear", default=None, choices=list(TABLES))
    args = p.parse_args()

    db = DBService(url=args.db)
    if not db.available:
        print("database not available", file=sys.stderr)
        sys.exit(1)

    if args.clear:
        n = db.update  # no dedicated delete; use raw connection
        with db._lock:
            cur = db._conn.execute(f"DELETE FROM {args.clear}")
            db._conn.commit()
        print(f"cleared {cur.rowcount} rows from {args.clear}")
        return

    for name, cls in TABLES.items():
        if args.table and name != args.table:
            continue
        rows = db.select(cls, limit=args.limit)
        print(f"== {name} ({db.count(cls)} total, showing {len(rows)}) ==")
        for r in rows:
            print(json.dumps(r.__dict__, ensure_ascii=False, default=str)[:500])


if __name__ == "__main__":
    main()
