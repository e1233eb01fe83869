"""youtu_rag_tpu — a TPU-native agentic-RAG framework.

A ground-up rebuild of the capabilities of TencentCloudADP/youtu-rag
(reference layout surveyed in SURVEY.md) designed TPU-first:

- the retrieval core (embedding forward, vector index, masked top-k,
  reranking) runs on TPU as jit-compiled JAX + Pallas kernels over
  sharded device arrays instead of delegating to external services
  (reference: utu/rag/embeddings/*, utu/rag/storage/implementations/*);
- multi-chip scale comes from ``jax.sharding`` meshes + collectives
  (per-shard fused top-k, all-gather merge over ICI), not HTTP fan-out;
- the agent plane (toolkits, agents, memory, API) is async Python that
  calls into the engine through the same retrieval-tool interface the
  reference exposes (utu/tools/base.py, utu/rag/rag_tools/*).

Subpackages
-----------
core        data model + config tree (ref: utu/rag/base.py, utu/rag/config.py)
ops         Pallas/XLA kernels: fused masked top-k, k-means/IVF, quantization
index       device vector index, metadata columns, filter compiler, persistence
parallel    mesh helpers + sharded (multi-chip) index search
models      tokenizer, encoder trunk, embedder/reranker, contrastive training
ingest      loaders, chunkers, knowledge builder (ref: utu/rag/knowledge_builder)
retrieval   vector store facade, retriever, context assembly
tools       toolkit base/registry + builtin toolkits (ref: utu/tools)
agents      LLM client, simple agent, orchestrators (ref: utu/agents)
memory      vector memory store + memory toolkit (ref: utu/tools/memory_toolkit.py)
api         tornado HTTP/SSE service (ref: utu/rag/api)
db          sqlite-backed trajectory/KB registry (ref: utu/db, utu/rag/api/database.py)
tracing     in-process span tracer with DB sink (ref: utu/tracing)
eval        benchmark harness (ref: utu/eval)
"""

from .version import __version__

__all__ = ["__version__"]


def _honor_platform_env() -> None:
    """Some environments pre-import jax via a site hook and pin the
    platform programmatically, which silently overrides the JAX_PLATFORMS
    env var. If the user asked for a platform and backends have not been
    initialized yet, re-assert their choice."""
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax
        from jax._src import xla_bridge

        if not xla_bridge._backends:
            jax.config.update("jax_platforms", want)
    except Exception:  # noqa: BLE001 - best effort only
        pass


_honor_platform_env()
