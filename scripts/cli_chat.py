#!/usr/bin/env python
"""CLI chat REPL over a knowledge base (ref: scripts/cli_chat.py:15-44).

Builds a KB from files/directories, registers KB-search tools, and chats:

    python scripts/cli_chat.py --paths docs/ --provider hash
    python scripts/cli_chat.py --paths corpus/*.md --provider tpu \
        --llm-model gpt-4o-mini --llm-base-url http://... --llm-api-key ...

Without an LLM endpoint (YRT_LLM_*/UTU_LLM_* or flags), falls back to
retrieval-only mode: prints the assembled context for each query."""

from __future__ import annotations

import argparse
import asyncio
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--paths", nargs="+", required=True, help="files/dirs/globs to index")
    p.add_argument("--provider", default="hash", choices=["hash", "tpu", "openai", "service"])
    p.add_argument(
        "--weights-dir", default=None,
        help="provider tpu: train_embedder output dir (e.g. the committed "
        "benchmarks/models/yrt_tiny_lex lexical-residual encoder)",
    )
    p.add_argument("--top-k", type=int, default=5)
    p.add_argument("--llm-model", default=None)
    p.add_argument("--llm-base-url", default=None)
    p.add_argument("--llm-api-key", default=None)
    p.add_argument(
        "--llm-weights-dir", default=None,
        help="serve a LOCAL causal-LM checkpoint dir (config.json + "
        "model.safetensors + tokenizer.json; gpt2/llama/mistral/qwen2 "
        "layouts) on the TPU instead of a remote LLM service",
    )
    p.add_argument("--hybrid", action="store_true", help="dense+BM25 RRF fusion retrieval")
    return p.parse_args()


def collect_files(paths: list[str]) -> list[str]:
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                out.extend(os.path.join(root, f) for f in files)
        else:
            out.extend(glob.glob(p) or [p])
    return sorted(set(out))


async def main() -> None:
    args = parse_args()

    from youtu_rag_tpu.agents.config import AgentConfig, ModelConfig
    from youtu_rag_tpu.agents.simple_agent import SimpleAgent
    from youtu_rag_tpu.core.config import EmbeddingConfig, RAGConfig
    from youtu_rag_tpu.retrieval.kb import GLOBAL_KB_REGISTRY, KnowledgeBase
    from youtu_rag_tpu.tools.base import ToolkitConfig
    from youtu_rag_tpu.tools.kb_search import KBSearchToolkit

    cfg = RAGConfig(name="cli")
    cfg.knowledge_builder.embedding = EmbeddingConfig(
        provider=args.provider, weights_dir=args.weights_dir
    )
    kb = KnowledgeBase("cli", cfg)
    GLOBAL_KB_REGISTRY.register(kb)

    files = [f for f in collect_files(args.paths) if os.path.isfile(f)]
    if not files:
        print(f"error: no files found under {args.paths}", file=sys.stderr)
        sys.exit(2)
    print(f"indexing {len(files)} files ...")
    status = await kb.build_files(files)
    print(f"built: {status.total_chunks} chunks from {status.processed_documents} docs "
          f"({len(status.errors)} errors)")

    if args.llm_weights_dir:
        model = ModelConfig(provider="local", weights_dir=args.llm_weights_dir)
        has_llm = True
    else:
        model = ModelConfig(
            model=args.llm_model, base_url=args.llm_base_url, api_key=args.llm_api_key
        ).resolved()
        has_llm = bool(model.model and model.base_url)

    agent = None
    if has_llm:
        from youtu_rag_tpu.models.lm_synth import DEFAULT_KB_INSTRUCTIONS

        toolkit = KBSearchToolkit(ToolkitConfig(config={"kb": kb}))
        acfg = AgentConfig(model=model)
        # shared with scripts/train_chat_lm.py — the committed tiny chat LM
        # is trained against exactly this system prompt
        acfg.agent.instructions = DEFAULT_KB_INSTRUCTIONS
        agent = SimpleAgent(acfg, toolkits=[toolkit])
        await agent.build()
        where = "local TPU decoder" if args.llm_weights_dir else "remote LLM"
        print(f"LLM connected ({where}) — agentic mode. Ctrl-D to exit.")
    else:
        print("no LLM configured — retrieval-only mode. Ctrl-D to exit.")

    retriever = kb.hybrid_retriever if args.hybrid else kb.retriever
    while True:
        try:
            query = input("\n> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not query:
            continue
        if agent is not None:
            rec = agent.run_streamed(query)
            async for ev in rec.stream_events():
                if ev.type == "text_delta":
                    print(ev.text, end="", flush=True)
                elif ev.type == "tool_call":
                    print(f"\n[tool {ev.name}({ev.arguments})]", flush=True)
            print()
        else:
            results = await retriever.retrieve(query, top_k=args.top_k, similarity_threshold=0.0)
            print(kb.assembler.assemble(results, format_style="markdown") or "(no hits)")


if __name__ == "__main__":
    asyncio.run(main())
