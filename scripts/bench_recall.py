#!/usr/bin/env python
"""Adversarial recall harness (VERDICT r2 item 3).

The old recall evidence came from well-separated synthetic clusters
(bench_scale --spread 0.7, queries at the sampled centers) where IVF
recall 1.0 is near-guaranteed. This harness measures recall@k on three
datasets built to make IVF fail:

  overlap   — clusters at spread 1.5 (heavily overlapping shells);
  offcenter — spread 0.9 but queries sit BETWEEN clusters (midpoints of
              random cross-cluster db pairs) — the pruning worst case;
  text      — this repo's own files chunked and embedded (hash embedder
              by default, --provider tpu for the encoder): real-text
              geometry, not gaussian.

Ground truth = exact f32 cosine on the original vectors (numpy). Each
dataset reports recall@k and latency for: device brute force, IVF at the
default probe plan, IVF + adaptive margin, and IVF + residual re-rank
(the tuned config — target >= 0.95 where the plain config scores < 1).

Run:  python scripts/bench_recall.py [--n-rows 262144 --provider hash]
Writes benchmarks/recall_report.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _normalize(x):
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def gen_overlap(rng, n, d, n_clusters=64, spread=1.5, n_q=32):
    centers = _normalize(rng.standard_normal((n_clusters, d), dtype=np.float32))
    cid = rng.integers(0, n_clusters, n)
    x = centers[cid] + (spread / np.sqrt(d)) * rng.standard_normal((n, d), dtype=np.float32)
    x = _normalize(x)
    # queries: perturbed db points, off-center by construction
    q = x[rng.integers(0, n, n_q)] + (1.0 / np.sqrt(d)) * rng.standard_normal(
        (n_q, d), dtype=np.float32
    )
    return x, _normalize(q)


def gen_offcenter(rng, n, d, n_clusters=64, spread=0.9, n_q=32):
    centers = _normalize(rng.standard_normal((n_clusters, d), dtype=np.float32))
    cid = rng.integers(0, n_clusters, n)
    x = centers[cid] + (spread / np.sqrt(d)) * rng.standard_normal((n, d), dtype=np.float32)
    x = _normalize(x)
    a = x[rng.integers(0, n, n_q)]
    b = x[rng.integers(0, n, n_q)]
    q = (a + b) / 2 + (0.3 / np.sqrt(d)) * rng.standard_normal((n_q, d), dtype=np.float32)
    return x, _normalize(q)


def _tpu_embedder(batch_size=256):
    """TpuEmbedder honoring --pretrained/--npz (weights dir from
    train_embedder: encoder_config.json [+ vocab.txt] next to the npz)."""
    import os as _os

    from youtu_rag_tpu.models.embedder import TpuEmbedder

    pre = getattr(gen_text, "_pretrained", None)
    npz = getattr(gen_text, "_npz", None)
    if pre:
        return TpuEmbedder.from_pretrained(pre, batch_size=batch_size)
    if npz:
        from youtu_rag_tpu.models.encoder import load_encoder_config, load_params_npz

        d = _os.path.dirname(_os.path.abspath(npz))
        cfg = load_encoder_config(_os.path.join(d, "encoder_config.json"))
        tokenizer = None
        vocab = _os.path.join(d, "vocab.txt")
        if _os.path.exists(vocab):
            from youtu_rag_tpu.models.wordpiece import WordPieceTokenizer

            tokenizer = WordPieceTokenizer(vocab, max_length=cfg.max_len)
        return TpuEmbedder(
            config=cfg, params=load_params_npz(npz),
            batch_size=batch_size, tokenizer=tokenizer,
        )
    return TpuEmbedder(batch_size=batch_size)


def gen_text(rng, n, d, provider="hash", n_q=32):
    """Chunk this repo's own files and embed them — real-text geometry."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    texts: list[str] = []
    for pattern in ("youtu_rag_tpu/**/*.py", "docs/**/*.md", "*.md", "tests/**/*.py"):
        for f in sorted(root.glob(pattern)):
            try:
                body = f.read_text(encoding="utf-8", errors="ignore")
            except OSError:
                continue
            for i in range(0, len(body), 400):
                piece = body[i : i + 500]
                if len(piece.strip()) > 80:
                    texts.append(piece)
    rng.shuffle(texts)
    # cap at the REAL corpus size: tiling with perturbed duplicates would
    # fill the index with near-identical vectors whose f32-vs-quantized
    # tie-breaking noise masquerades as recall loss
    n = min(n, len(texts))
    texts = texts[:n]

    if provider == "tpu":
        emb = _tpu_embedder()
        x = emb.embed_batch(texts).astype(np.float32)
        if x.shape[1] != d:
            x = x[:, :d]
    else:
        from youtu_rag_tpu.models.embedder import HashEmbedder

        x = HashEmbedder(dim=d).embed_batch(texts)
    x = _normalize(x)
    # queries: short extracts of random chunks (realistic partial match)
    qi = rng.integers(0, n, n_q)
    q_texts = [texts[i][40:200] for i in qi]
    if provider == "tpu":
        q = emb.embed_batch(q_texts).astype(np.float32)[:, :d]
    else:
        q = HashEmbedder(dim=d).embed_batch(q_texts)
    return x, _normalize(q)


def ground_truth(x, q, k):
    s = q.astype(np.float32) @ x.T.astype(np.float32)
    return np.argsort(-s, axis=1)[:, :k]


def measure(idx, queries, truth, k, label, reps=3, query_batch=4):
    """Searches run in small query batches: the probed-block plan is the
    UNION over the batch (ops/ivf probe list is shared), so a big batch
    over a small index covers every block and degenerates IVF to brute —
    which is exactly what this harness must not silently do."""
    t_best = 1e9
    res = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = []
        for i in range(0, len(queries), query_batch):
            out.extend(idx.search(queries[i : i + query_batch], top_k=k))
        res = out
        t_best = min(t_best, (time.perf_counter() - t0) * 1e3)
    hits = 0
    for qi, hits_q in enumerate(res):
        # compare by chunk id — build_ivf cluster-sorts rows, so device
        # rows and insertion indices diverge
        ids = {c.id for c, _ in hits_q}
        hits += len(ids & {f"c{j}" for j in truth[qi].tolist()})
    rec = hits / (len(res) * k)
    print(f"  {label:28s} recall@{k} {rec:.3f}   {t_best:7.2f} ms", file=sys.stderr)
    return {"recall": round(rec, 4), "ms": round(t_best, 2)}


def run_dataset(name, x, q, k, n_lists, args):
    from youtu_rag_tpu.core.config import IndexConfig
    from youtu_rag_tpu.core.types import Chunk
    from youtu_rag_tpu.index.device_index import DeviceVectorIndex

    print(f"[{name}] n={len(x)} d={x.shape[1]}", file=sys.stderr)
    truth = ground_truth(x, q, k)
    chunks = [Chunk(f"c{i}", f"d{i // 64}", "", 0) for i in range(len(x))]
    out = {}

    def build(**kw):
        cfg = IndexConfig(
            storage_dtype=args.dtype, block_rows=args.block_rows,
            min_capacity=len(x), n_lists=n_lists, **kw,
        )
        idx = DeviceVectorIndex(x.shape[1], cfg)
        idx.add(chunks, x)
        return idx

    idx = build(n_probe=args.n_probe)
    out["brute"] = measure(idx, q, truth, k, f"brute {args.dtype}")

    # int4 packed tier: the throughput end of the storage ladder — raw
    # quantization recall floor AND the production two-stage config
    # (device int4 candidates → host int8-shadow re-rank) on the SAME
    # adversarial data, so the speed/recall tradeoff is measured
    cfg_raw = IndexConfig(
        storage_dtype="int4", block_rows=args.block_rows, min_capacity=len(x),
        int4_rerank_multiplier=0.0,
    )
    idx_raw = DeviceVectorIndex(x.shape[1], cfg_raw)
    idx_raw.add(chunks, x)
    out["brute_int4_raw"] = measure(idx_raw, q, truth, k, "brute int4 raw")
    del idx_raw
    cfg_2s = IndexConfig(
        storage_dtype="int4", block_rows=args.block_rows, min_capacity=len(x),
    )
    idx_2s = DeviceVectorIndex(x.shape[1], cfg_2s)
    idx_2s.add(chunks, x)
    out["brute_int4_2stage"] = measure(
        idx_2s, q, truth, k, "brute int4 + host int8 rerank x4"
    )
    del idx_2s

    idx.build_ivf()
    out["ivf_plain"] = measure(idx, q, truth, k, f"ivf nprobe={args.n_probe}")
    idx2 = build(n_probe=args.n_probe, ivf_adaptive_margin=0.1)
    idx2.build_ivf()
    out["ivf_adaptive"] = measure(idx2, q, truth, k, "ivf adaptive m=0.1")
    idx3 = build(n_probe=args.n_probe * 2, ivf_rerank_multiplier=4.0)
    idx3.build_ivf()
    out["ivf_rerank"] = measure(
        idx3, q, truth, k, f"ivf nprobe={args.n_probe * 2} + rerank x4"
    )
    # the fully tuned config: bf16 storage (removes the int8 quantization
    # recall floor the re-rank cannot recover — candidates re-score from
    # the STORED values) + residual re-rank + the CLOSED-LOOP nprobe
    # auto-tuner converging on the recall target (shadow brute checks
    # drive n_probe up until recall@k >= target — the engine's designed
    # answer to hard-to-cluster data, not a hand-picked constant)
    from youtu_rag_tpu.core.config import IndexConfig as _IC

    cfg4 = _IC(
        storage_dtype="bfloat16", block_rows=args.block_rows,
        min_capacity=len(x), n_lists=n_lists,
        # self-consistency target 0.98: the tuner measures IVF against
        # brute on the SAME storage, so ~2% headroom covers the residual
        # storage-rounding gap to the f32 ground truth
        n_probe=args.n_probe * 2, ivf_rerank_multiplier=4.0,
        ivf_recall_target=0.98, ivf_tune_interval=1,
    )
    idx4 = DeviceVectorIndex(x.shape[1], cfg4)
    idx4.add(chunks, x)
    idx4.build_ivf()
    for _ in range(12):  # let the tuner converge before measuring
        for i in range(0, len(q), 4):
            idx4.search(q[i : i + 4], top_k=k)
        if (idx4._ivf_recall_est or 0.0) >= 0.98:
            break
    out["ivf_tuned_bf16"] = measure(
        idx4, q, truth, k,
        f"ivf bf16 auto-nprobe={idx4._ivf.n_probe} + rerank x4 (tuned)",
    )
    out["ivf_tuned_bf16"]["n_probe_final"] = int(idx4._ivf.n_probe)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-rows", type=int, default=262144)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n-lists", type=int, default=256)
    p.add_argument("--n-probe", type=int, default=8)
    p.add_argument("--block-rows", type=int, default=1024)
    p.add_argument("--dtype", default="int8")
    p.add_argument("--provider", default="hash", choices=["hash", "tpu"])
    p.add_argument("--pretrained", default=None, help="pretrained checkpoint dir for --provider tpu")
    p.add_argument("--npz", default=None, help="train_embedder weights for --provider tpu")
    p.add_argument("--datasets", default="overlap,offcenter,text")
    args = p.parse_args()
    gen_text._pretrained = args.pretrained
    gen_text._npz = args.npz

    rng = np.random.default_rng(0)
    report = {
        "n_rows": args.n_rows, "dim": args.dim, "k": args.k,
        "n_lists": args.n_lists, "n_probe": args.n_probe,
        "storage_dtype": args.dtype, "text_provider": args.provider,
        "datasets": {},
    }
    gens = {
        "overlap": lambda: gen_overlap(rng, args.n_rows, args.dim),
        "offcenter": lambda: gen_offcenter(rng, args.n_rows, args.dim),
        "text": lambda: gen_text(rng, args.n_rows, args.dim, args.provider),
    }
    for name in args.datasets.split(","):
        x, q = gens[name]()
        report["datasets"][name] = run_dataset(
            name, x, q, args.k, args.n_lists, args
        )

    print(json.dumps(report))
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/recall_report.json", "w") as f:
        f.write(json.dumps(report, indent=1) + "\n")


if __name__ == "__main__":
    main()
