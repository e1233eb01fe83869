#!/usr/bin/env python
"""Embedder + ingest throughput benchmark (the 'index-build docs/sec'
north-star axis).

Measures on the current device:
  - encoder forward throughput (sequences/s and tokens/s) for the base
    TPU encoder config at several batch/length buckets;
  - end-to-end ingest docs/sec through KnowledgeBuilder with the hash
    embedder (host pipeline ceiling) for reference.

    python scripts/bench_embedder.py [--layers 12 --d-model 768]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--d-model", type=int, default=768)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--d-ff", type=int, default=3072)
    p.add_argument("--vocab", type=int, default=32768)
    p.add_argument("--attention", default="xla", choices=["xla", "pallas"])
    args = p.parse_args()

    from youtu_rag_tpu.utils.devices import FALLBACK_LABEL, resolve_backend

    platform = resolve_backend()
    if platform == FALLBACK_LABEL:
        print(json.dumps({"metric": "embedder_throughput", "skipped": platform}))
        return

    import jax
    import jax.numpy as jnp

    from youtu_rag_tpu.models.encoder import (
        EncoderConfig,
        count_params,
        encode_tokens,
        init_encoder_params,
    )

    cfg = EncoderConfig(
        vocab_size=args.vocab,
        d_model=args.d_model,
        n_layers=args.layers,
        n_heads=args.heads,
        d_ff=args.d_ff,
        attention_impl=args.attention,
    )
    params = init_encoder_params(cfg, seed=0)
    n_params = count_params(params)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params, ids, mask, n):
        def body(c, _):
            # ids must depend on the carry or XLA hoists the forward out
            # of the scan as loop-invariant
            ids_c = (ids + c.astype(jnp.int32)) % cfg.vocab_size
            emb, _ = encode_tokens(params, ids_c, mask, cfg)
            return (c + 1.0) + 0.0 * emb[0, 0], emb[0, 0]

        return jax.lax.scan(body, jnp.float32(0.0), None, length=n)

    report = {"params": n_params, "platform": platform, "attention": args.attention, "buckets": []}
    rng = np.random.default_rng(0)
    for batch, seqlen in ((128, 128), (64, 256), (32, 512)):
        ids = jnp.asarray(rng.integers(4, args.vocab, (batch, seqlen)).astype(np.int32))
        mask = jnp.ones((batch, seqlen), jnp.float32)
        r = loop(params, ids, mask, 4)
        _ = np.asarray(r[0])
        t4 = 1e9
        for _rep in range(3):
            t0 = time.perf_counter()
            r = loop(params, ids, mask, 4)
            _ = np.asarray(r[0])
            t4 = min(t4, time.perf_counter() - t0)
        r = loop(params, ids, mask, 12)
        _ = np.asarray(r[0])
        t12 = 1e9
        for _rep in range(3):
            t0 = time.perf_counter()
            r = loop(params, ids, mask, 12)
            _ = np.asarray(r[0])
            t12 = min(t12, time.perf_counter() - t0)
        dt = max((t12 - t4) / 8, 1e-9)
        report["buckets"].append(
            {
                "batch": batch,
                "seqlen": seqlen,
                "ms_per_batch": round(dt * 1e3, 2),
                "seqs_per_s": round(batch / dt, 1),
                "tokens_per_s": round(batch * seqlen / dt),
            }
        )
        print(f"  b{batch} x s{seqlen}: {report['buckets'][-1]}", file=sys.stderr, flush=True)

    print(json.dumps(report))
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/embedder_report.json", "w") as f:
        f.write(json.dumps(report) + "\n")


if __name__ == "__main__":
    main()
