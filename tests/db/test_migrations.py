"""Schema migration tests: old DB files keep working after the model grows
(ref behavior: utu/rag/api/migrations column-add scripts)."""

import sqlite3

from youtu_rag_tpu.db.migrations import existing_columns, migrate_table
from youtu_rag_tpu.db.models import TrajectoryRecord
from youtu_rag_tpu.db.service import DBService


def test_old_schema_gains_missing_columns(tmp_path):
    path = tmp_path / "old.db"
    conn = sqlite3.connect(path)
    # simulate a DB written by an older build: only two columns exist
    conn.execute(
        "CREATE TABLE trajectories (_rowid INTEGER PRIMARY KEY AUTOINCREMENT, "
        '"trace_id" TEXT, "input" TEXT)'
    )
    conn.execute("INSERT INTO trajectories (trace_id, input) VALUES ('t1', 'hello')")
    conn.commit()
    conn.close()

    svc = DBService(f"sqlite:///{path}")
    assert svc.available
    # the old row is still readable; new columns read as NULL/None
    rows = svc.select(TrajectoryRecord, where={"trace_id": "t1"})
    assert rows and rows[0].input == "hello"
    # inserting a full modern record works (would fail without migration)
    assert svc.add(TrajectoryRecord(trace_id="t2", input="x", output="y"))
    assert svc.select(TrajectoryRecord, where={"trace_id": "t2"})[0].output == "y"
    svc.close()


def test_migrate_table_is_idempotent(tmp_path):
    path = tmp_path / "fresh.db"
    svc = DBService(f"sqlite:///{path}")
    svc.close()
    conn = sqlite3.connect(path)
    before = existing_columns(conn, "trajectories")
    assert migrate_table(conn, "trajectories", TrajectoryRecord) == []
    assert existing_columns(conn, "trajectories") == before
    conn.close()
