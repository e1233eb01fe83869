#!/usr/bin/env python
"""Convert benchmark dumps into the eval harness's jsonl format.

Parity surface: ``scripts/data/process_gaia.py`` / ``process_web_walker_qa.py``
in the reference (HF-hub download + SQL upload). This build has no network
egress and the harness reads plain jsonl (`eval/benchmark.py load_samples`),
so this script converts *local* raw dumps instead: each output line is
``{"question", "answer", "level", ...extras}``.

Formats:
  gaia        GAIA metadata.jsonl rows ("Question"/"Final answer"/"Level")
  webwalker   WebWalkerQA rows ("question"/"answer", info.difficulty)
  qa          passthrough rows already carrying question/answer keys

    python scripts/data/prepare_dataset.py gaia raw/metadata.jsonl data/gaia_validation.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _rows(path: Path):
    text = path.read_text()
    if path.suffix == ".json":
        data = json.loads(text)
        yield from (data if isinstance(data, list) else data.get("data", []))
        return
    for line in text.strip().splitlines():
        if line.strip():
            yield json.loads(line)


def convert_gaia(row: dict) -> dict | None:
    q = row.get("Question") or row.get("question")
    a = row.get("Final answer") or row.get("answer")
    if not q or a in (None, "", "?"):  # '?' marks unreleased test answers
        return None
    return {
        "question": q,
        "answer": str(a),
        "level": str(row.get("Level", row.get("level", ""))),
        "file_name": row.get("file_name", ""),
        "task_id": row.get("task_id", ""),
    }


def convert_webwalker(row: dict) -> dict | None:
    q, a = row.get("question"), row.get("answer")
    if not q or not a:
        return None
    info = row.get("info") or {}
    return {
        "question": q,
        "answer": str(a),
        "level": str(info.get("difficulty_level", row.get("level", ""))),
        "root_url": row.get("root_url", ""),
        "domain": info.get("domain", ""),
    }


def convert_qa(row: dict) -> dict | None:
    q = row.get("question") or row.get("query")
    a = row.get("answer") or row.get("correct_answer")
    if not q or a in (None, ""):
        return None
    out = dict(row)
    out["question"], out["answer"] = q, str(a)
    return out


CONVERTERS = {"gaia": convert_gaia, "webwalker": convert_webwalker, "qa": convert_qa}


def prepare(fmt: str, src: Path, dst: Path) -> int:
    conv = CONVERTERS[fmt]
    n, skipped = 0, 0
    dst.parent.mkdir(parents=True, exist_ok=True)
    with dst.open("w") as f:
        for row in _rows(src):
            out = conv(row)
            if out is None:
                skipped += 1
                continue
            f.write(json.dumps(out, ensure_ascii=False) + "\n")
            n += 1
    print(f"wrote {n} samples to {dst} ({skipped} skipped: missing question/answer)")
    return n


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("format", choices=sorted(CONVERTERS))
    p.add_argument("src", type=Path)
    p.add_argument("dst", type=Path)
    args = p.parse_args()
    if not args.src.exists():
        sys.exit(f"source file not found: {args.src}")
    prepare(args.format, args.src, args.dst)


if __name__ == "__main__":
    main()
