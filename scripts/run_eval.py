#!/usr/bin/env python
"""Run a benchmark evaluation (ref: scripts/run_eval.py:25-40).

    python scripts/run_eval.py --config_name default
    python scripts/run_eval.py --data path/to/data.jsonl --exp-id exp1
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


async def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config_name", default=None, help="configs/eval/<name> to load")
    p.add_argument("--data", default=None, help="jsonl dataset with question/answer fields")
    p.add_argument("--exp-id", default="default")
    p.add_argument(
        "--processor",
        default="exact_match",
        choices=["exact_match", "llm_judge", "gaia", "webwalker", "xbench", "browsecomp"],
    )
    p.add_argument("--concurrency", type=int, default=4)
    args = p.parse_args()

    from youtu_rag_tpu.eval.benchmark import BaseBenchmark
    from youtu_rag_tpu.eval.config import EvalConfig, EvalDataConfig

    if args.config_name:
        from youtu_rag_tpu.core.loader import ConfigLoader

        config = ConfigLoader().load_eval_config(args.config_name)
    else:
        config = EvalConfig(
            exp_id=args.exp_id,
            processor=args.processor,
            concurrency=args.concurrency,
            data=EvalDataConfig(dataset="cli", source=args.data or ""),
        )

    bench = BaseBenchmark(config)
    stats = await bench.main()
    print(json.dumps(stats, ensure_ascii=False))


if __name__ == "__main__":
    asyncio.run(main())
