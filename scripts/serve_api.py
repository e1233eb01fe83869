#!/usr/bin/env python
"""Serve the RAG API (ref: start.sh → uvicorn utu.rag.api.main:app).

    python scripts/serve_api.py --port 8080 --data-dir ./data/api
"""

from __future__ import annotations

import argparse
import asyncio
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


async def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--data-dir", default="./data/api")
    p.add_argument("--agent-config", default=None, help="configs/agents/<name> to load")
    p.add_argument(
        "--shards", type=int, default=0,
        help="shard every KB index over an N-device mesh (multi-chip "
        "serving; 0 = single device). Needs N visible devices — real "
        "chips, or XLA_FLAGS=--xla_force_host_platform_device_count=N "
        "JAX_PLATFORMS=cpu for a local demo.",
    )
    p.add_argument(
        "--search-coalesce-ms", type=float, default=0.0,
        help="merge concurrent KB searches inside this window into one "
        "fused kernel launch (serving hot path; 2-5 ms is typical)",
    )
    p.add_argument(
        "--embedding-provider", default=None,
        choices=["hash", "tpu", "openai", "service"],
        help="default embedding provider for new knowledge bases",
    )
    p.add_argument(
        "--weights-dir", default=None,
        help="provider tpu: serve a train_embedder output dir (e.g. the "
        "committed benchmarks/models/yrt_tiny_lex lexical-residual encoder)",
    )
    p.add_argument(
        "--llm-weights-dir", default=None,
        help="serve a LOCAL causal-LM checkpoint dir through the chat "
        "routes (e.g. the committed benchmarks/models/yrt_tiny_chat from "
        "scripts/train_chat_lm.py) — the whole product runs in-process, "
        "no external LLM service",
    )
    args = p.parse_args()

    from youtu_rag_tpu.api.app import create_app
    from youtu_rag_tpu.api.state import ApiState

    agent_config = None
    if args.agent_config:
        from youtu_rag_tpu.core.loader import ConfigLoader

        agent_config = ConfigLoader().load_agent_config(args.agent_config)
    if args.llm_weights_dir:
        from youtu_rag_tpu.agents.config import AgentConfig
        from youtu_rag_tpu.models.lm_synth import DEFAULT_KB_INSTRUCTIONS
        from youtu_rag_tpu.tools.base import ToolkitConfig

        agent_config = agent_config or AgentConfig()
        # keep YAML-configured generation params (temperature, max_tokens,
        # chat_template) — only the provider/weights change
        agent_config.model = agent_config.model.model_copy(
            update={"provider": "local", "weights_dir": args.llm_weights_dir}
        )
        # the committed tiny chat LM is trained against exactly this
        # system prompt (scripts/train_chat_lm.py) — and it WILL emit
        # kb_embedding_search calls, so make sure the toolkit is wired
        # (mirrors configs/agents/kb_search.yaml) even without --agent-config
        agent_config.toolkits.setdefault(
            "kb_search", ToolkitConfig(name="kb_search")
        )
        agent_config.agent.instructions = DEFAULT_KB_INSTRUCTIONS

    mesh = None
    if args.shards:
        from youtu_rag_tpu.parallel.mesh import get_mesh

        mesh = get_mesh({"db": args.shards})
        print(f"serving with a {args.shards}-way sharded index mesh")

    rag_config = None
    if args.search_coalesce_ms > 0 or args.embedding_provider or args.weights_dir:
        from youtu_rag_tpu.core.config import RAGConfig

        rag_config = RAGConfig()
        if args.search_coalesce_ms > 0:
            rag_config.vector_store.coalesce_window_ms = args.search_coalesce_ms
        if args.embedding_provider or args.weights_dir:
            emb = rag_config.knowledge_builder.embedding
            rag_config.knowledge_builder.embedding = emb.model_copy(update={
                "provider": args.embedding_provider or ("tpu" if args.weights_dir else emb.provider),
                "weights_dir": args.weights_dir,
            })

    state = ApiState(
        data_dir=args.data_dir, agent_config=agent_config,
        rag_config=rag_config, mesh=mesh,
    )
    app = create_app(state)
    app.listen(args.port)
    print(f"youtu_rag_tpu API listening on :{args.port}")
    await asyncio.Event().wait()


if __name__ == "__main__":
    asyncio.run(main())
