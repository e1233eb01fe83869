#!/usr/bin/env python
"""Headline benchmark: fused masked top-k query throughput at 1M x 768.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- value: query batches/sec (batch=8 queries, k=10) through the Pallas fused
  matmul+top-k kernel on one TPU chip over a 1,048,576 x 768 bf16 index —
  the engine behind every kb_embedding_search tool call (the op the
  reference delegates to ChromaDB HNSW / FAISS flat on CPU).
- vs_baseline: speedup over the CPU FAISS-flat-style baseline (NumPy f32
  GEMM + argpartition on this host), measured on a subsample and scaled
  linearly (both paths are bandwidth/compute linear in N).

Timing uses the two-length lax.scan difference method: the axon tunnel adds
~27 ms fixed RPC latency per call and its block_until_ready is unreliable,
so (T(iters=48) - T(iters=1)) / 47 with np.asarray barriers isolates true
device time. The long scan amortizes offset jitter ~12x better than the
r1 (20-4)/16 variant — five consecutive int8 runs land within 5%
(1.243-1.300 ms observed), closing the r1 pinning item.
"""

import functools
import json
import os
import time

import numpy as np


def main() -> None:
    # Resolve the backend FIRST (killable subprocess probe): a down axon
    # tunnel must degrade to a parseable CPU line, never a traceback
    # (round-3 postmortem: BENCH_r03 rc=1 from a bare jax.devices()).
    from youtu_rag_tpu.utils.devices import resolve_backend

    platform = resolve_backend()
    degraded = platform not in ("tpu", "axon")

    import jax
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.topk import pallas_topk_pruned, xla_topk

    d, q, k = 768, 8, 10
    # On the CPU fallback shrink the index 8x and shorten the scan so the
    # driver still gets its JSON line in ~a minute on one core.
    N = 512 * 2048 if not degraded else 64 * 2048  # 1,048,576 / 131,072
    block_rows = 4096
    long_iters = 48 if not degraded else 8

    on_tpu = jax.devices()[0].platform == "tpu"

    Xd = jax.random.normal(jax.random.PRNGKey(0), (N, d), jnp.bfloat16)
    bd = jnp.zeros(N, jnp.float32)
    Q0 = jax.random.normal(jax.random.PRNGKey(1), (q, d), jnp.float32)
    _ = np.asarray(jnp.sum(Xd.astype(jnp.float32)))  # materialize

    def run(fn, arrays, iters: int, reps: int = 4) -> float:
        # NOTE: every device array must be a jit *argument* — a closed-over
        # array becomes a compile-time constant and compilation explodes.
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(Q, arrays, n):
            def body(c, _):
                s, i = fn(Q + c, *arrays)
                return c + 1.0, (s[0, 0], i[0, 0])

            return jax.lax.scan(body, 0.0, None, length=n)

        r = loop(Q0, arrays, iters)
        _ = np.asarray(r[0])  # compile + warm
        best = 1e9
        for rep in range(reps):
            t0 = time.perf_counter()
            r = loop(Q0 + rep, arrays, iters)
            _ = np.asarray(r[0])
            best = min(best, time.perf_counter() - t0)
        return best

    def measure(fn, arrays) -> float:
        t1, tn = run(fn, arrays, 1), run(fn, arrays, long_iters)
        return max((tn - t1) / (long_iters - 1), 1e-9)

    if on_tpu:
        # pruned kernel: running-threshold block pruning (exact results),
        # 13-15% faster than the always-select kernel — production default
        main_fn = lambda Q, X, b: pallas_topk_pruned(Q, X, b, k, block_rows=block_rows)
    else:  # CPU fallback so the script still runs anywhere
        main_fn = lambda Q, X, b: xla_topk(Q, X, b, k)

    dt = measure(main_fn, (Xd, bd))
    qps = q / dt

    # secondary path (int8 storage) — best effort
    extras = {}
    if on_tpu:
        try:
            from youtu_rag_tpu.ops.topk import pallas_topk_int8_pruned, quantize_rows_int8

            Xq, Xs = quantize_rows_int8(Xd.astype(jnp.float32))
            # int8 tiles are half the bytes of bf16, so double the block:
            # pruned@8192 measured 1.09 ms vs plain 1.28 ms same-run
            fn8 = lambda Q, Xq, Xs, b: pallas_topk_int8_pruned(
                Q, Xq, Xs, b, k, block_rows=2 * block_rows
            )
            extras["int8_ms_per_batch"] = round(measure(fn8, (Xq, Xs, bd)) * 1e3, 3)
            del Xq, Xs  # free before the int4 quantize transient
        except Exception as e:  # noqa: BLE001
            extras["int8_error"] = str(e)[:200]
        try:
            # int4 packed tier: half the int8 bytes again (storage ladder
            # floor); serving adds a ~µs host int8-shadow re-rank on top
            from youtu_rag_tpu.ops.topk import (
                pallas_topk_int4_pruned,
                quantize_rows_int4,
            )

            Xp, Xs4 = quantize_rows_int4(Xd.astype(jnp.float32))
            fn4 = lambda Q, Xp, Xs, b: pallas_topk_int4_pruned(
                Q, Xp, Xs, b, k, block_rows=block_rows
            )
            extras["int4_ms_per_batch"] = round(measure(fn4, (Xp, Xs4, bd)) * 1e3, 3)
            del Xp, Xs4
        except Exception as e:  # noqa: BLE001
            extras["int4_error"] = str(e)[:200]

    # CPU FAISS-flat-style baseline: f32 GEMM + argpartition, subsampled
    n_sub = 131072
    X_cpu = np.asarray(Xd[:n_sub].astype(jnp.float32))
    Q_cpu = np.asarray(Q0)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        scores = Q_cpu @ X_cpu.T
        part = np.argpartition(-scores, k, axis=1)[:, :k]
        _ = np.take_along_axis(scores, part, axis=1)
    cpu_dt = (time.perf_counter() - t0) / reps * (N / n_sub)
    cpu_qps = q / cpu_dt

    line = json.dumps(
        {
            "metric": "fused_topk_qps_1M_768_k10_b8",
            "value": round(qps, 1),
            "unit": "queries/sec/chip",
            "vs_baseline": round(qps / cpu_qps, 2),
            "detail": {
                "device_ms_per_batch": round(dt * 1e3, 3),
                "hbm_gbps": round(N * d * 2 / dt / 1e9, 1),
                "cpu_baseline_qps": round(cpu_qps, 2),
                "platform": platform,
                "n_rows": N,
                **extras,
            },
        }
    )
    try:  # refresh the committed last-run snapshot (best effort)
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "benchmarks", "bench_main_last.json"), "w"
        ) as f:
            f.write(line + "\n")
    except OSError:
        pass
    print(
        line
    )


if __name__ == "__main__":
    main()
