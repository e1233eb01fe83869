#!/usr/bin/env python
"""Generate an agent config from a natural-language requirement
(ref: scripts/gen_simple_agent.py).

    python scripts/gen_simple_agent.py "an agent that searches the KB and
        summarizes findings" --out configs/agents/generated/my_agent.yaml
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
    p.add_argument("--out", default="configs/agents/generated/agent.yaml")
    args = p.parse_args()

    from youtu_rag_tpu.agents.llm_agent import LLMAgent
    from youtu_rag_tpu.meta.generators import SimpleAgentGenerator

    gen = SimpleAgentGenerator(LLMAgent())
    cfg = await gen.generate_to_file(args.requirement, args.out)
    print(f"wrote {args.out}: agent {cfg.agent.name!r} with toolkits {list(cfg.toolkits)}")


if __name__ == "__main__":
    asyncio.run(main())
