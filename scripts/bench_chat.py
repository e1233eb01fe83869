#!/usr/bin/env python
"""End-to-end agent-loop benchmark for the local chat LM.

Drives the REAL serving stack — SimpleAgent → ReactChatClient →
LocalChatClient(decoder) → KBSearchToolkit → TPU retrieval — over a
fixture corpus built from held-out synthetic episodes (models/lm_synth.py):
the model must emit a parseable tool call, the retrieval engine must
recall the gold chunk, and the model must extract the right value from
the REAL observation it gets back.

Shape match: the reference's agentic-RAG quality tables
(``/root/reference/README.md:748-812``) measure an external LLM through
the same loop; here the LLM itself is the framework's own checkpoint.

    python scripts/bench_chat.py --weights-dir benchmarks/models/yrt_tiny_chat
Writes benchmarks/chat_report.json + one JSON line to stdout.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--weights-dir", default="benchmarks/models/yrt_tiny_chat")
    p.add_argument("--episodes", type=int, default=50)
    p.add_argument("--seed", type=int, default=202)
    p.add_argument("--out", default="benchmarks/chat_report.json")
    return p.parse_args()


async def run() -> dict:
    args = parse_args()

    from youtu_rag_tpu.agents.config import AgentConfig, ModelConfig
    from youtu_rag_tpu.agents.simple_agent import SimpleAgent
    from youtu_rag_tpu.core.config import EmbeddingConfig, RAGConfig
    from youtu_rag_tpu.core.types import Document
    from youtu_rag_tpu.models.lm_synth import DEFAULT_KB_INSTRUCTIONS, synth_episode
    from youtu_rag_tpu.retrieval.kb import GLOBAL_KB_REGISTRY, KnowledgeBase
    from youtu_rag_tpu.tools.base import ToolkitConfig
    from youtu_rag_tpu.tools.kb_search import KBSearchToolkit

    rng = random.Random(args.seed)
    episodes = [synth_episode(rng) for _ in range(args.episodes)]

    # fixture KB: every episode's gold chunk + distractors as documents
    cfg = RAGConfig(name="chatbench")
    cfg.knowledge_builder.embedding = EmbeddingConfig(provider="hash")
    kb = KnowledgeBase("chatbench", cfg)
    GLOBAL_KB_REGISTRY.register(kb)
    docs = []
    for i, ep in enumerate(episodes):
        docs.append(Document(id=f"gold-{i}", content=ep.gold_chunk,
                             metadata={"source": ep.source}))
        for j, d in enumerate(ep.distractors):
            docs.append(Document(id=f"d-{i}-{j}", content=d,
                                 metadata={"source": f"dis_{i}_{j}.md"}))
    status = await kb.build_documents(docs)
    assert status.total_chunks >= len(docs), status

    model = ModelConfig(provider="local", weights_dir=args.weights_dir)
    acfg = AgentConfig(model=model)
    acfg.agent.instructions = DEFAULT_KB_INSTRUCTIONS
    # production-recommended retrieval config: hybrid fusion behind the
    # stable kb_embedding_search tool name (the LM is trained on that name;
    # pseudo-word entities are exactly the rare-term case hybrid's
    # exact-identifier slots guarantee)
    toolkit = KBSearchToolkit(ToolkitConfig(config={"kb": kb, "mode": "hybrid"}))
    agent = SimpleAgent(acfg, toolkits=[toolkit])
    await agent.build()

    n_tool = n_recall = n_correct = 0
    latencies = []
    failures = []
    for ep in episodes:
        t0 = time.time()
        rec = await agent.run(ep.question)
        latencies.append(time.time() - t0)
        n_tool += bool(rec.tool_calls)
        # retrieval recall: did the REAL engine surface the gold chunk in
        # the observation the model actually saw?
        recalled = any(ep.gold_chunk in tc.output for tc in rec.tool_calls)
        n_recall += recalled
        answer = (rec.final_output or "").strip()
        ok = answer == ep.answer
        n_correct += ok
        if not ok and len(failures) < 5:
            failures.append({"q": ep.question, "gold": ep.answer,
                             "recalled": recalled, "got": answer[:120]})

    # ---- no-retrieval ablation: same model + loop over an EMPTY KB, so
    # every observation is "No results found." — answers can only come
    # from the parametric model. Values are random pseudo-words, so any
    # gap vs the main run is retrieval-grounded by construction.
    empty_cfg = RAGConfig(name="chatbench_empty")
    empty_cfg.knowledge_builder.embedding = EmbeddingConfig(provider="hash")
    empty_kb = KnowledgeBase("chatbench_empty", empty_cfg)
    GLOBAL_KB_REGISTRY.register(empty_kb)
    ablation_agent = SimpleAgent(
        acfg,
        toolkits=[KBSearchToolkit(
            ToolkitConfig(config={"kb": empty_kb, "mode": "hybrid"})
        )],
    )
    await ablation_agent.build()
    n_abl = 0
    for ep in episodes:
        rec = await ablation_agent.run(ep.question)
        n_abl += (rec.final_output or "").strip() == ep.answer

    n = len(episodes)
    lat = sorted(latencies)
    report = {
        "episodes": n,
        "weights_dir": str(args.weights_dir),
        "tool_call_rate": round(n_tool / n, 4),
        "retrieval_recall": round(n_recall / n, 4),
        "answer_exact": round(n_correct / n, 4),
        "answer_exact_no_retrieval": round(n_abl / n, 4),
        "latency_p50_s": round(lat[n // 2], 3),
        "latency_p95_s": round(lat[int(n * 0.95)], 3),
        "failures": failures,
    }
    return report


def main() -> None:
    args = parse_args()
    if not Path(args.weights_dir).is_dir():
        # degrade contract of scripts/tpu_bench_all.sh: parseable JSON, rc 0
        print(json.dumps({
            "skipped": True,
            "reason": f"weights dir {args.weights_dir} missing "
                      "(run scripts/train_chat_lm.py first)",
        }))
        return
    from youtu_rag_tpu.utils.provenance import run_provenance

    report = asyncio.run(run())
    report.update(run_provenance(seed=args.seed, episodes=args.episodes))
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "failures"}))


if __name__ == "__main__":
    main()
