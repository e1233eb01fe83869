#!/usr/bin/env python
"""10M-vector scale benchmark on one TPU chip (BASELINE configs[2]-ish).

int8 storage keeps 10,485,760 x 768 at ~7.7 GB so the full index lives in
single-chip HBM. Measures:
  - brute-force fused int8 top-k latency/QPS,
  - IVF (cluster-sorted, scalar-prefetch kernel) latency and recall@10 vs
    the brute-force ground truth,
at several nprobe settings on clustered synthetic data.

Run:  python scripts/bench_scale.py [--n-rows 10485760]
Writes a JSON report to stdout and benchmarks/scale_report.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import tempfile
from pathlib import Path
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-rows", type=int, default=2560 * 4096)  # 10,485,760
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--n-clusters", type=int, default=1024)
    p.add_argument("--queries", type=int, default=8)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--block-rows", type=int, default=4096)
    p.add_argument(
        "--spread",
        type=float,
        default=0.7,
        help="within-cluster spread: noise std = spread/sqrt(d). ~0.7 gives "
        "realistic embedding-like neighborhoods; >>1 degenerates to uniform "
        "directions where IVF cannot help (worst case)",
    )
    args = p.parse_args()

    from youtu_rag_tpu.utils.devices import FALLBACK_LABEL, resolve_backend

    platform = resolve_backend()
    if platform == FALLBACK_LABEL:
        # Down tunnel must not crash the battery (round-3 postmortem):
        # emit a parseable skip line, keep rc 0, don't clobber the report.
        print(json.dumps({"metric": "scale_10M", "skipped": platform}))
        return

    import jax
    import jax.numpy as jnp

    from youtu_rag_tpu.index.ivf import probe_blocks
    from youtu_rag_tpu.ops.ivf import pallas_ivf_topk_int8_dma
    from youtu_rag_tpu.ops.kmeans import kmeans_fit
    from youtu_rag_tpu.ops.topk import pallas_topk_int8_pruned

    N, d, q, k, BR = args.n_rows, args.dim, args.queries, args.k, args.block_rows
    assert N % BR == 0
    nb = N // BR
    rng = np.random.default_rng(0)

    # clustered data generated host-side in chunks (int8 + per-row scales);
    # cached to disk — generation is ~30 min of single-core numpy at 10M
    # rows, the cache makes re-runs (and the int4 lane) pay it once
    cache = Path(tempfile.gettempdir()) / (
        f"yrt_scale_{N}x{d}_c{args.n_clusters}_s{args.spread}.npz"
    )
    if cache.exists():
        print(f"loading cached rows from {cache} ...", file=sys.stderr, flush=True)
        z = np.load(cache)
        X8, scales, queries = z["X8"], z["scales"], z["queries"]
    else:
        print(f"generating {N} clustered rows ...", file=sys.stderr, flush=True)
        centers = rng.standard_normal((args.n_clusters, d), dtype=np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        X8 = np.empty((N, d), np.int8)
        scales = np.empty(N, np.float32)
        chunk = 1 << 19
        noise = args.spread / np.sqrt(d)
        for i in range(0, N, chunk):
            m = min(chunk, N - i)
            cid = rng.integers(0, args.n_clusters, m)
            # standard_normal(dtype=f32) avoids the float64 temporary that
            # made generation kernel-bound (page zeroing dominated wall)
            v = centers[cid] + noise * rng.standard_normal((m, d), dtype=np.float32)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            amax = np.maximum(np.abs(v).max(axis=1), 1e-12)
            scales[i : i + m] = amax / 127.0
            X8[i : i + m] = np.clip(np.round(v / (amax / 127.0)[:, None]), -127, 127)
        queries = centers[:q] + 0.5 * noise * rng.standard_normal((q, d), dtype=np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        try:
            np.savez(cache, X8=X8, scales=scales, queries=queries)
        except OSError as e:  # disk-full etc. — benchmark anyway
            print(f"cache write failed: {e}", file=sys.stderr, flush=True)

    print("transferring to device ...", file=sys.stderr, flush=True)
    Xd = jax.device_put(jnp.asarray(X8))
    Sd = jax.device_put(jnp.asarray(scales))
    jax.block_until_ready((Xd, Sd))
    print("transfer done", file=sys.stderr, flush=True)
    bd = jnp.zeros(N, jnp.float32)
    Qd = jnp.asarray(queries)

    def amortized(fn, arrays, iters=8):  # sub-ms paths need bigger iters to resolve
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(Q, arrays, n):
            def body(c, _):
                s, i = fn(Q + c * 1e-6, *arrays)
                return c + 1.0, (s[0, 0], i[0, 0])

            return jax.lax.scan(body, 0.0, None, length=n)

        r = loop(Qd, arrays, iters)
        _ = np.asarray(r[0])
        best = 1e9
        for rep in range(3):
            t0 = time.perf_counter()
            r = loop(Qd + rep * 1e-7, arrays, iters)
            _ = np.asarray(r[0])
            best = min(best, time.perf_counter() - t0)
        return best

    report: dict = {"n_rows": N, "dim": d, "queries": q, "k": k, "platform": platform}

    # ---- brute force ground truth + timing -------------------------------
    print("brute force ...", file=sys.stderr, flush=True)
    gs, gi = pallas_topk_int8_pruned(Qd, Xd, Sd, bd, k, block_rows=BR)
    truth = np.asarray(gi)
    t4 = amortized(lambda Q, X, S, b: pallas_topk_int8_pruned(Q, X, S, b, k, block_rows=BR), (Xd, Sd, bd), 4)
    t12 = amortized(lambda Q, X, S, b: pallas_topk_int8_pruned(Q, X, S, b, k, block_rows=BR), (Xd, Sd, bd), 12)
    dt = max((t12 - t4) / 8, 1e-9)
    report["brute_int8_ms"] = round(dt * 1e3, 3)
    report["brute_int8_qps"] = round(q / dt, 1)
    report["brute_int8_gbps"] = round(N * d / dt / 1e9, 1)

    # ---- int4 packed tier (half the int8 bytes; 10M×768 → 3.9 GB) -------
    print("int4 packed ...", file=sys.stderr, flush=True)
    try:
        from youtu_rag_tpu.ops.topk import pallas_topk_int4_pruned

        half = d // 2
        Xp_host = np.empty((N, half), np.int8)
        step = 1 << 20
        for i in range(0, N, step):
            q4 = np.clip(
                np.round(
                    X8[i : i + step].astype(np.float32) / 127.0 * 7.0
                ),
                -7, 7,
            ).astype(np.int32)  # re-quantize the int8 rows to int4 levels
            Xp_host[i : i + step] = (
                (q4[:, :half] & 0xF) | ((q4[:, half:] & 0xF) << 4)
            ).astype(np.uint8).view(np.int8)
        S4 = jnp.asarray(scales * (127.0 / 7.0))
        Xp = jnp.asarray(Xp_host)
        del Xp_host
        _ = np.asarray(jnp.sum(Xp.astype(jnp.int32)))
        s4_, i4_ = pallas_topk_int4_pruned(Qd, Xp, S4, bd, k, block_rows=BR)
        t4a = amortized(
            lambda Q, X, S, b: pallas_topk_int4_pruned(Q, X, S, b, k, block_rows=BR),
            (Xp, S4, bd), 4,
        )
        t12a = amortized(
            lambda Q, X, S, b: pallas_topk_int4_pruned(Q, X, S, b, k, block_rows=BR),
            (Xp, S4, bd), 12,
        )
        dt4 = max((t12a - t4a) / 8, 1e-9)
        got4 = np.asarray(i4_)
        report["brute_int4_ms"] = round(dt4 * 1e3, 3)
        report["brute_int4_qps"] = round(q / dt4, 1)
        report["brute_int4_gbps"] = round(N * d / 2 / dt4 / 1e9, 1)
        report["brute_int4_raw_recall_vs_int8"] = round(
            float(np.mean([
                len(set(got4[r]) & set(truth[r])) / k for r in range(q)
            ])), 4,
        )
        del Xp, S4
    except Exception as e:  # noqa: BLE001 - int4 lane is best-effort
        report["brute_int4_error"] = str(e)[:200]

    # ---- IVF build: kmeans on a sample, assign in chunks, sort -----------
    print("ivf build ...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    sample_idx = np.sort(rng.choice(N, 131072, replace=False))
    sample = (
        X8[sample_idx].astype(np.float32) * scales[sample_idx][:, None]
    )
    cent = kmeans_fit(jnp.asarray(sample), args.n_clusters, iters=8)

    @jax.jit
    def assign_chunk(x8, sc, c):
        v = x8.astype(jnp.float32) * sc[:, None]
        return jnp.argmax(v @ c.T, axis=1).astype(jnp.int32)

    assigns = np.empty(N, np.int32)
    step = 1 << 20
    for i in range(0, N, step):
        assigns[i : i + step] = np.asarray(
            assign_chunk(Xd[i : i + step], Sd[i : i + step], cent)
        )
    perm = np.argsort(assigns, kind="stable")
    build_s = time.perf_counter() - t0
    report["ivf_build_s"] = round(build_s, 1)
    report["ivf_build_rows_per_s"] = round(N / build_s)

    # free the unsorted copy before uploading the sorted one (HBM budget)
    del Xd, Sd
    Xs_sorted = jax.device_put(jnp.asarray(X8[perm]))
    Ss_sorted = jax.device_put(jnp.asarray(scales[perm]))
    inv = np.empty(N, np.int64)
    inv[perm] = np.arange(N)  # old row -> new row for recall mapping
    truth_sorted = inv[truth]

    counts = np.bincount(assigns, minlength=args.n_clusters)
    row_start = np.concatenate([[0], np.cumsum(counts)])
    block_start = jnp.asarray((row_start[:-1] // BR).astype(np.int32))
    block_cnt = jnp.asarray(
        np.maximum(np.ceil(row_start[1:] / BR).astype(np.int32) - (row_start[:-1] // BR), 0)
        * (counts > 0)
    )
    max_cb = int(np.asarray(block_cnt).max())

    results = []
    # (n_probe, adaptive_margin): margin > 0 drops probed clusters trailing
    # the per-query best centroid score (per-query adaptive nprobe)
    for n_probe, margin in ((4, 0.0), (8, 0.0), (16, 0.0), (16, 0.1), (16, 0.2)):
        est = q * n_probe * max_cb + 16
        max_blocks = 1 << (est - 1).bit_length()
        max_blocks = min(max_blocks, nb)
        adaptive = (
            {"adaptive_margin": jnp.float32(margin), "min_probe": jnp.int32(2)}
            if margin > 0
            else {}
        )
        ids, n_valid = probe_blocks(
            Qd,
            cent,
            block_start,
            block_cnt,
            n_probe=n_probe,
            max_cluster_blocks=max_cb,
            total_blocks=nb,
            frozen_blocks=nb,
            max_blocks=max_blocks,
            **adaptive,
        )

        def ivf_fn(Q, X, S, b, ids=ids, nv=n_valid):
            return pallas_ivf_topk_int8_dma(Q, X, S, b, ids, nv, k, block_rows=BR)

        s_i, i_i = ivf_fn(Qd, Xs_sorted, Ss_sorted, bd)
        got = np.asarray(i_i)
        recall = np.mean(
            [len(set(got[r]) & set(truth_sorted[r])) / k for r in range(q)]
        )
        idset = set(np.asarray(ids)[: int(np.asarray(n_valid))].tolist())
        truth_in_probed = float(
            np.mean([(int(tr) // BR) in idset for r in range(q) for tr in truth_sorted[r]])
        )
        # fast IVF paths are sub-ms: use a wide iteration spread so the
        # difference rises above tunnel jitter
        t_lo = amortized(ivf_fn, (Xs_sorted, Ss_sorted, bd), 8)
        t_hi = amortized(ivf_fn, (Xs_sorted, Ss_sorted, bd), 72)
        dt_ivf = max((t_hi - t_lo) / 64, 1e-9)
        results.append(
            {
                "n_probe": n_probe,
                "adaptive_margin": margin,
                "probed_blocks": int(np.asarray(n_valid)),
                "total_blocks": nb,
                "recall_at_10": round(float(recall), 4),
                "truth_in_probed": round(truth_in_probed, 4),
                "ms_per_batch": round(dt_ivf * 1e3, 3),
                "speedup_vs_brute": round(dt / dt_ivf, 2),
            }
        )
        print(f"  nprobe={n_probe} margin={margin}: {results[-1]}", file=sys.stderr, flush=True)
    report["ivf"] = results

    out = json.dumps(report)
    print(out)
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/scale_report.json", "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
