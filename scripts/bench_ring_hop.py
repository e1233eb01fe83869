#!/usr/bin/env python
"""Ring-attention inner-hop cost: unblocked einsum vs flash-stats kernel.

The sequence-parallel ring (parallel/sequence_parallel.py) runs one
attention hop per ppermute rotation. The original hop materialized the
full [Tl, Tl] score block; the flash inner hop (ops/attention.py::
flash_attention_stats) streams K/V with online softmax and returns
(acc, m, l) for the cross-hop merge. This measures ONE hop of each at
long local blocks on a single chip — the per-hop work is identical math
on every ring rank, so single-chip hop cost is the scaling driver
(collectives overlap with compute).

Appends a "ring_hop" section to benchmarks/attention_report.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.attention import flash_attention_stats

    b, h, hd = 2, 12, 64
    scale = 1.0 / np.sqrt(hd)

    def einsum_hop(q, k, v, bias):
        # the pre-round-3 ring inner step: full [Tl, Tl] scores in f32
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        s = s + bias[:, None, None, :]
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[..., None])
        l = jnp.sum(p, axis=-1)
        acc = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
        return acc, m, l

    def flash_hop(q, k, v, bias):
        return flash_attention_stats(q, k, v, bias)

    def run(fn, arrays, iters=4):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(arrays, n):
            def body(c, _):
                acc, m, l = fn(arrays[0] + c * 1e-6, *arrays[1:])
                return c + 1.0, (acc[0, 0, 0, 0], l[0, 0, 0])
            return jax.lax.scan(body, 0.0, None, length=n)

        _ = np.asarray(loop(arrays, iters)[0])
        _ = np.asarray(loop(arrays, 2 * iters)[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(loop(arrays, iters)[0])
            t_a = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = np.asarray(loop(arrays, 2 * iters)[0])
            t_b = time.perf_counter() - t0
            best = min(best, (t_b - t_a) / iters)
        return best * 1e3

    out = {}
    for tl in (2048, 4096, 8192):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, h, tl, hd), jnp.bfloat16)
        k = jax.random.normal(key, (b, h, tl, hd), jnp.bfloat16)
        v = jax.random.normal(key, (b, h, tl, hd), jnp.bfloat16)
        bias = jnp.zeros((b, tl), jnp.float32)
        row = {}
        for name, fn in (("einsum_hop", einsum_hop), ("flash_hop", flash_hop)):
            try:
                row[name] = round(run(fn, (q, k, v, bias)), 3)
            except Exception as e:  # noqa: BLE001 - OOM/VMEM expected for einsum at big Tl
                row[name] = f"fail: {str(e)[:80]}"
            print(f"Tl={tl} {name}: {row[name]}", file=sys.stderr, flush=True)
        out[f"Tl={tl}"] = row

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "benchmarks", "attention_report.json")
    with open(path) as f:
        report = json.load(f)
    report["ring_hop"] = {
        "note": "one SP ring hop (b2 h12 hd64 bf16): einsum materializes "
                "[Tl,Tl] f32 scores; flash streams K/V (flash_attention_stats)",
        "ms_per_hop": out,
    }
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["ring_hop"]))


if __name__ == "__main__":
    main()
