"""Replay server card conversion (ref: scripts/utils/replay_server.py)."""

import importlib.util
import sys
from pathlib import Path

from youtu_rag_tpu.db.models import TrajectoryRecord


def _load_replay_module():
    path = Path(__file__).resolve().parents[2] / "scripts" / "replay_server.py"
    spec = importlib.util.spec_from_file_location("replay_server", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["replay_server"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_cards_mirror_live_protocol():
    replay = _load_replay_module()
    rec = TrajectoryRecord(
        trace_id="t1",
        input="q",
        output="the answer",
        trajectory=[
            {"role": "user", "content": "q"},
            {"role": "tool", "name": "kb_embedding_search", "arguments": "{}", "output": "hits"},
            {"role": "assistant", "content": "draft"},
        ],
    )
    cards = replay.cards_from_trajectory(rec)
    types = [c["type"] for c in cards]
    assert types == ["plan", "tool_call", "tool_output", "text_delta", "final"]
    assert cards[1]["name"] == "kb_embedding_search"
    assert cards[-1]["content"] == "the answer"


def test_error_run_emits_error_card():
    replay = _load_replay_module()
    rec = TrajectoryRecord(trace_id="t2", input="q", error="boom", trajectory=[])
    assert replay.cards_from_trajectory(rec)[-1]["type"] == "error"
