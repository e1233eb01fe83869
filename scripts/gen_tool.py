#!/usr/bin/env python
"""Generate a toolkit module from a natural-language requirement
(ref: scripts/gen_tool.py → ToolGenerator/ToolGeneratorDebugger; here the
generator import-validates and retries internally, meta/generators.py).

    python scripts/gen_tool.py "a toolkit that fetches RSS feeds" \
        --out youtu_rag_tpu/tools/generated/rss.py
"""

from __future__ import annotations

import argparse
import asyncio
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


async def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("requirement")
    p.add_argument("--out", default="generated_toolkit.py")
    p.add_argument("--retries", type=int, default=2)
    args = p.parse_args()

    from youtu_rag_tpu.agents.llm_agent import LLMAgent
    from youtu_rag_tpu.meta.generators import ToolGenerator

    gen = ToolGenerator(LLMAgent(), max_retries=args.retries)
    cls = await gen.generate_to_file(args.requirement, args.out)
    tools = list(cls().tools_map)
    print(f"wrote {args.out}: toolkit {cls.__name__} with tools {tools}")


if __name__ == "__main__":
    asyncio.run(main())
