"""Dataset prep converters (ref: scripts/data/process_gaia.py et al.)."""

import importlib.util
import json
import sys
from pathlib import Path


def _mod():
    path = Path(__file__).resolve().parents[2] / "scripts" / "data" / "prepare_dataset.py"
    spec = importlib.util.spec_from_file_location("prepare_dataset", path)
    m = importlib.util.module_from_spec(spec)
    sys.modules["prepare_dataset"] = m
    spec.loader.exec_module(m)
    return m


def test_gaia_rows_convert_and_unreleased_skip(tmp_path):
    m = _mod()
    src = tmp_path / "raw.jsonl"
    src.write_text(
        json.dumps({"Question": "Q1", "Final answer": "42", "Level": 2, "task_id": "t"})
        + "\n"
        + json.dumps({"Question": "Q2", "Final answer": "?"})  # unreleased test answer
        + "\n"
    )
    dst = tmp_path / "out.jsonl"
    assert m.prepare("gaia", src, dst) == 1
    row = json.loads(dst.read_text().strip())
    assert row == {"question": "Q1", "answer": "42", "level": "2", "file_name": "", "task_id": "t"}


def test_webwalker_and_qa_formats(tmp_path):
    m = _mod()
    ww = m.convert_webwalker(
        {"question": "q", "answer": "a", "info": {"difficulty_level": "easy", "domain": "d"}}
    )
    assert ww["level"] == "easy" and ww["domain"] == "d"
    qa = m.convert_qa({"query": "q", "correct_answer": 7, "extra": 1})
    assert qa["question"] == "q" and qa["answer"] == "7" and qa["extra"] == 1
    assert m.convert_qa({"query": "q"}) is None


def test_output_feeds_eval_harness(tmp_path):
    """The converted jsonl loads through BaseBenchmark.load_samples."""
    m = _mod()
    src = tmp_path / "raw.jsonl"
    src.write_text(json.dumps({"Question": "Q", "Final answer": "A", "Level": 1}) + "\n")
    dst = tmp_path / "gaia.jsonl"
    m.prepare("gaia", src, dst)

    from youtu_rag_tpu.eval.benchmark import BaseBenchmark
    from youtu_rag_tpu.eval.config import EvalConfig

    cfg = EvalConfig(processor="exact_match", data={"dataset": "gaia", "source": str(dst)})
    samples = BaseBenchmark(cfg).load_samples()
    assert len(samples) == 1
    assert samples[0].raw_question == "Q" and samples[0].correct_answer == "A"
    assert samples[0].level == "1"
