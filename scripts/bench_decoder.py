#!/usr/bin/env python
"""Decoder (local LLM) throughput on one chip: prefill tok/s + decode tok/s.

Measures the models/decoder.py runtime at GPT-2-class size (124M: L=12
D=768 H=12 V=50304) in bf16 with random weights — throughput depends only
on shapes/dtypes, not weight values. Prints ONE JSON line →
``benchmarks/decoder_report.json``.

Timing: the whole generation is a single jitted while_loop, so the
two-max_new difference method cancels prefill + fixed RPC:
  decode_ms_per_token = (T(max_new=N) − T(max_new=N/2)) / (N/2)
with np.asarray barriers (CLAUDE.md: axon block_until_ready unreliable).
Prefill is timed by the two-length scan difference over the teacher-forced
forward at T=512.

Ref slot: the reference's LLM is an external HTTP service — no local
number exists to compare; the baseline column reports the same decoder on
host CPU (numpy-free torch-free JAX CPU path) scaled from a short run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from youtu_rag_tpu.utils.devices import resolve_backend

    platform = resolve_backend()
    degraded = platform not in ("tpu", "axon")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from youtu_rag_tpu.models.decoder import (
        DecoderConfig,
        generate,
        init_decoder_params,
        left_pad_batch,
    )

    cfg = DecoderConfig(
        vocab_size=50304,  # gpt2 vocab rounded up to a 128 multiple (MXU tiling)
        d_model=768,
        n_layers=12,
        n_heads=12,
        n_kv_heads=12,
        d_ff=3072,
        max_len=1024,
        arch="gpt2",
        dtype=jnp.bfloat16,
        eos_token_id=50255,  # random weights never emit it: full-length runs
    )
    if degraded:
        cfg = DecoderConfig(
            vocab_size=50304, d_model=256, n_layers=4, n_heads=4, n_kv_heads=4,
            d_ff=1024, max_len=512, arch="gpt2", dtype=jnp.bfloat16,
            eos_token_id=50255,
        )
    from youtu_rag_tpu.models.decoder import cast_params_for_serving

    # serving layout: bf16 matmul weights (f32 storage measured exactly 2x
    # slower per decode step — decode reads every weight byte per token)
    params = jax.device_put(cast_params_for_serving(init_decoder_params(cfg, seed=0)))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    def timed(fn, *args, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best

    report = {"platform": "tpu" if not degraded else "cpu-fallback",
              "params": n_params, "arch": cfg.arch, "dtype": "bf16"}

    # ---- prefill: teacher-forced forward at T=512 ------------------------
    bsz_pf, t_pf = (8, 512) if not degraded else (2, 128)
    toks = jax.random.randint(jax.random.PRNGKey(0), (bsz_pf, t_pf), 0, 50000)
    mask = jnp.ones((bsz_pf, t_pf), jnp.float32)

    from functools import partial

    from youtu_rag_tpu.models.decoder import init_cache, prefill

    # params is a jit ARGUMENT (a closed-over device array would become a
    # compile-time constant — CLAUDE.md), scan length is static per compile.
    # The cache sum keeps the K/V writes alive against DCE, and the tokens
    # must depend on the scan index or XLA hoists the whole body out of the
    # loop (measured: a loop-invariant body reports 0.03 ms for a 1-TFLOP
    # prefill).
    @partial(jax.jit, static_argnames=("n",))
    def pf_n(params, toks, mask, n):
        def body(c, i):
            toks_i = (toks + i) % 50000
            cache = init_cache(cfg, toks.shape[0], toks.shape[1])
            logits, cache = prefill(params, toks_i, mask, cache, cfg)
            return c + logits[:, :1].sum() + cache["k"].astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(n))[0]

    pf1 = partial(pf_n, n=1)
    pf5 = partial(pf_n, n=5)
    _ = np.asarray(pf1(params, toks, mask)); _ = np.asarray(pf5(params, toks, mask))
    dt = (timed(pf5, params, toks, mask) - timed(pf1, params, toks, mask)) / 4
    report["prefill"] = {
        "batch": bsz_pf, "seqlen": t_pf,
        "ms": round(dt * 1e3, 2),
        "tokens_per_s": int(bsz_pf * t_pf / dt),
    }
    print(f"prefill {report['prefill']}", file=sys.stderr, flush=True)

    # ---- decode: generate at two lengths, difference ---------------------
    # Bytes model (VERDICT r4 item 8): each decode step reads every bf16
    # weight byte once (shared across the batch) plus the FULL allocated
    # KV cache (static shapes: attention scans all maxT slots, masked).
    # With the two-length difference T(n_hi)−T(n_lo), cache allocation is
    # tp+n per run, so the measured per-step time corresponds to an
    # EFFECTIVE cache length (n_hi·(tp+n_hi) − n_lo·(tp+n_lo))/(n_hi−n_lo).
    HBM_PEAK_GBPS = 819.0  # v5e
    n_hi, n_lo = (256, 128) if not degraded else (32, 16)
    tp_len = 4  # prompt [1,2,3,4], bucketed to 4
    t_eff = (n_hi * (tp_len + n_hi) - n_lo * (tp_len + n_lo)) / (n_hi - n_lo)
    weights_gb = 2 * n_params / 1e9

    def cache_gb_per_step(bsz: int, kv_dtype: str) -> float:
        elt = 1 if kv_dtype == "int8" else 2
        per_slot = cfg.n_layers * bsz * cfg.n_kv_heads * t_eff
        kv = 2 * per_slot * cfg.head_dim * elt  # K and V planes
        scales = 2 * per_slot * 4 if kv_dtype == "int8" else 0
        return (kv + scales) / 1e9

    def run_decode(label: str, run_cfg) -> dict:
        rows = {}
        kv_dtype = getattr(run_cfg, "kv_cache_dtype", "native")
        for bsz in ((1, 8, 32) if not degraded else (1, 4)):
            prompt, pmask = left_pad_batch([[1, 2, 3, 4]] * bsz, pad_id=0)
            key = jax.random.PRNGKey(1)

            def gen(n, prompt=prompt, pmask=pmask, key=key):
                return generate(params, jnp.asarray(prompt), jnp.asarray(pmask),
                                key, cfg=run_cfg, max_new_tokens=n)[0]

            _ = np.asarray(gen(n_lo)); _ = np.asarray(gen(n_hi))  # compile both
            dt = (timed(gen, n_hi) - timed(gen, n_lo)) / (n_hi - n_lo)
            model_gb = weights_gb + cache_gb_per_step(bsz, kv_dtype)
            rows[f"batch{bsz}"] = {
                "ms_per_step": round(dt * 1e3, 3),
                "tokens_per_s": int(bsz / dt),
                "model_bytes_gb": round(model_gb, 4),
                "hbm_gbps": round(model_gb / dt, 1),
                "pct_roofline": round(100 * model_gb / dt / HBM_PEAK_GBPS, 1),
            }
            print(f"decode[{label}] b={bsz}: {rows[f'batch{bsz}']}",
                  file=sys.stderr, flush=True)
        return rows

    decode = run_decode("bf16-kv", cfg)
    report["decode"] = decode
    report["bytes_model"] = {
        "weights_gb": round(weights_gb, 4),
        "effective_cache_len": round(t_eff, 1),
        "hbm_peak_gbps": HBM_PEAK_GBPS,
        "note": "model bytes/step = bf16 weights once + full allocated KV "
                "cache (static-shape attention reads every maxT slot); "
                "effective_cache_len reflects the two-length difference",
    }

    # int8 KV cache (decoder.py kv_cache_dtype='int8'): halves the cache
    # stream; matters where the cache dominates bytes (large B, long T)
    if not degraded:
        import dataclasses

        cfg8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
        report["decode_int8_kv"] = run_decode("int8-kv", cfg8)

    b1 = decode.get("batch1", {}).get("ms_per_step")
    if b1:
        report["decode_hbm_gbps_b1"] = round(
            (weights_gb + cache_gb_per_step(1, "native")) / (b1 / 1e3), 1)

    with open("benchmarks/decoder_report.json", "w") as f:
        json.dump(report, f)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
