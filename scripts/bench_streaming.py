#!/usr/bin/env python
"""Streaming build concurrent with query traffic (BASELINE configs[4]).

Starts from a populated index and interleaves:
  - writer: appends row batches (embeddings precomputed);
  - reader: timed top-k searches against the live index.

Reports query latency percentiles while the index grows vs idle, plus
ingest throughput. Per-dispatch tunnel latency (~27 ms on axon) dominates
absolute numbers; the *delta* between idle and during-build distributions
is the signal.

    python scripts/bench_streaming.py [--initial 262144 --batches 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(int(len(xs) * p), len(xs) - 1)] if xs else 0.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--initial", type=int, default=262144)
    p.add_argument("--batch-rows", type=int, default=16384)
    p.add_argument("--batches", type=int, default=12)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--runs", type=int, default=2,
                   help="consecutive idle→build→after cycles (target must hold on all)")
    p.add_argument("--idle-reps", type=int, default=60,
                   help="idle-phase query count (beats tunnel jitter in the denominator)")
    args = p.parse_args()

    from youtu_rag_tpu.utils.devices import FALLBACK_LABEL, resolve_backend

    platform = resolve_backend()
    if platform == FALLBACK_LABEL:
        print(json.dumps({"metric": "streaming_build", "skipped": platform}))
        return

    from youtu_rag_tpu.core.config import IndexConfig
    from youtu_rag_tpu.core.types import Chunk
    from youtu_rag_tpu.index.device_index import DeviceVectorIndex

    rng = np.random.default_rng(0)
    d = args.dim
    cfg = IndexConfig(min_capacity=args.initial, block_rows=2048, auto_compact_ratio=0.0)
    idx = DeviceVectorIndex(d, cfg)

    def mkvecs(n):
        v = rng.normal(size=(n, d)).astype(np.float32)
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    print(f"seeding {args.initial} rows ...", file=sys.stderr, flush=True)
    seeded = 0
    cid = 0
    while seeded < args.initial:
        n = min(65536, args.initial - seeded)
        chunks = [Chunk(f"c{cid + i}", f"d{(cid + i) // 1000}", "", 0) for i in range(n)]
        idx.add(chunks, mkvecs(n))
        cid += n
        seeded += n

    queries = mkvecs(8)
    idx.search(queries, top_k=args.k)  # warm compile

    def measure(n_queries: int) -> list[float]:
        lat = []
        for _ in range(n_queries):
            t0 = time.perf_counter()
            idx.search(queries, top_k=args.k)
            lat.append((time.perf_counter() - t0) * 1e3)
        return lat

    def run_once() -> dict:
        """One idle → concurrent-build → after cycle. Consecutive cycles
        (--runs, VERDICT r3 item 8) expose tunnel-jitter in the idle
        denominator instead of letting one friendly run carry the claim."""
        nonlocal cid
        idle = measure(args.idle_reps)
        stop = threading.Event()
        added = {"rows": 0, "batches": 0, "t": 0.0}

        def writer():
            nonlocal cid
            t0 = time.perf_counter()
            for _ in range(args.batches):
                n = args.batch_rows
                chunks = [
                    Chunk(f"c{cid + i}", f"d{(cid + i) // 1000}", "", 0) for i in range(n)
                ]
                v = mkvecs(n)
                idx.add(chunks, v)
                added["rows"] += n
                added["batches"] += 1
                cid += n
            added["t"] = time.perf_counter() - t0
            stop.set()

        w = threading.Thread(target=writer)
        w.start()
        during = []
        while not stop.is_set():
            t0 = time.perf_counter()
            idx.search(queries, top_k=args.k)
            during.append((time.perf_counter() - t0) * 1e3)
        w.join()
        after = measure(max(args.idle_reps // 2, 10))
        idle_p95 = pct(idle, 0.95)
        build_p95 = pct(during, 0.95)
        return {
            "rows_added": added["rows"],
            "ingest_rows_per_s": round(added["rows"] / max(added["t"], 1e-9)),
            "queries_during_build": len(during),
            "idle_ms": {"p50": round(pct(idle, 0.5), 1), "p95": round(idle_p95, 1)},
            "during_build_ms": {"p50": round(pct(during, 0.5), 1), "p95": round(build_p95, 1)},
            "after_ms": {
                "p50": round(pct(after, 0.5), 1), "p95": round(pct(after, 0.95), 1)
            },
            "p95_ratio": round(build_p95 / max(idle_p95, 1e-9), 2),
        }

    runs = [run_once() for _ in range(args.runs)]
    report = {
        "initial_rows": args.initial,
        "platform": platform,
        "runs": runs,
        "max_p95_ratio": max(r["p95_ratio"] for r in runs),
        "final_count": idx.count(),
        # back-compat top-level fields = the worst run (honest headline)
        **max(runs, key=lambda r: r["p95_ratio"]),
    }
    print(json.dumps(report))
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/streaming_report.json", "w") as f:
        f.write(json.dumps(report) + "\n")


if __name__ == "__main__":
    main()
