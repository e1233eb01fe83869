#!/usr/bin/env python
"""Encoder attention kernel comparison at long sequence lengths (real TPU).

XLA fused vs blockwise (full-T K/V in VMEM) vs flash (K/V-blocked online
softmax). Timing: two-length lax.scan difference (see bench.py)."""

import functools
import json
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.attention import blockwise_attention, flash_attention

    b, h, hd = 2, 12, 64

    def xla_attn(q, k, v, bias):
        mask_bias = bias[:, None, None, :]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s / np.sqrt(hd) + mask_bias
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def run(fn, arrays, iters):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(arrays, n):
            def body(c, _):
                o = fn(arrays[0] + c * 1e-6, *arrays[1:])
                return c + 1.0, o[0, 0, 0, 0]
            return jax.lax.scan(body, 0.0, None, length=n)
        r = loop(arrays, iters)
        _ = np.asarray(r[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(arrays, iters)
            _ = np.asarray(r[0])
            best = min(best, time.perf_counter() - t0)
        return best

    out = {}
    for t in (4096, 8192, 16384):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, h, t, hd), jnp.bfloat16)
        k = jax.random.normal(key, (b, h, t, hd), jnp.bfloat16)
        v = jax.random.normal(key, (b, h, t, hd), jnp.bfloat16)
        bias = jnp.zeros((b, t), jnp.float32)
        row = {}
        for name, fn in (
                        ("blockwise", lambda q, k, v, bias: blockwise_attention(q, k, v, bias, block_q=256)),
            ("flash", lambda q, k, v, bias: flash_attention(q, k, v, bias, block_q=512, block_k=512)),
        ):
            try:
                t4, t12 = run(fn, (q, k, v, bias), 4), run(fn, (q, k, v, bias), 12)
                row[name] = round(max((t12 - t4) / 8, 1e-9) * 1e3, 3)
            except Exception as e:
                row[name] = f"error: {str(e)[:120]}"
        out[f"T={t}"] = row
    print(json.dumps({"attention_ms": out, "shape": f"b{b} h{h} hd{hd} bf16"}))


if __name__ == "__main__":
    main()
