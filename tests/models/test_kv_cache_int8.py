"""int8 KV-cache parity: quantized-cache decode tracks the native path.

VERDICT r4 item 8: the decode loop's dominant HBM stream at long T is the
cache re-read; ``DecoderConfig(kv_cache_dtype="int8")`` halves it. These
tests pin (a) the quant/dequant error bound, (b) decode-vs-teacher-forced
closeness under quantization, and (c) greedy-generation token parity with
the native cache on a real (tiny) model — the serving-facing invariant.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from youtu_rag_tpu.models.decoder import (
    DecoderConfig,
    _dequantize_kv,
    _quantize_kv,
    causal_logits,
    decode_step,
    generate,
    init_cache,
    init_decoder_params,
    left_pad_batch,
    prefill,
)


def _tiny(**kw) -> DecoderConfig:
    base = dict(
        vocab_size=128, d_model=32, n_layers=2, n_heads=4, n_kv_heads=2,
        d_ff=64, max_len=64, arch="llama", dtype=jnp.float32, eos_token_id=0,
    )
    base.update(kw)
    return DecoderConfig(**base)


def test_quant_roundtrip_error_bound():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 2, 5, 16)), jnp.float32)
    q, s = _quantize_kv(x)
    back = _dequantize_kv(q, s, jnp.float32)
    # symmetric int8: per-row max error ≤ scale/2 = amax/254
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert np.all(np.abs(np.asarray(back) - np.asarray(x)) <= amax / 254 + 1e-7)


def test_int8_cache_structure():
    cfg = _tiny(kv_cache_dtype="int8")
    cache = init_cache(cfg, batch=2, max_len=16)
    assert cache["k"].dtype == jnp.int8 and cache["v"].dtype == jnp.int8
    assert cache["k_scale"].shape == (2, 2, 2, 16)
    assert cache["k_scale"].dtype == jnp.float32


def test_int8_decode_tracks_teacher_forced():
    cfg8 = _tiny(kv_cache_dtype="int8")
    params = init_decoder_params(cfg8, seed=3)
    ids = np.array([[7, 3, 9, 1, 22, 40]], np.int32)
    t = ids.shape[1]
    mask = np.ones_like(ids, np.float32)
    full = np.asarray(causal_logits(params, jnp.asarray(ids), jnp.asarray(mask), cfg8))

    n0 = 3
    cache = init_cache(cfg8, 1, t)
    logits, cache = prefill(
        params, jnp.asarray(ids[:, :n0]), jnp.asarray(mask[:, :n0]), cache, cfg8
    )
    # prefill attends over full-precision k/v — exact parity
    np.testing.assert_allclose(np.asarray(logits), full[:, n0 - 1], atol=1e-4)
    attn = np.zeros((1, t), np.float32)
    attn[:, :n0] = 1.0
    for i in range(n0, t):
        attn[:, i] = 1.0
        logits, cache = decode_step(
            params, jnp.asarray(ids[:, i]), jnp.int32(i), jnp.asarray(attn),
            jnp.asarray([i], jnp.int32), cache, cfg8,
        )
        # int8 cache: close, not exact — the bound scales with activation
        # magnitude; 2e-2 on f32 logits of a unit-init model is ~1% relative
        np.testing.assert_allclose(
            np.asarray(logits), full[:, i], atol=2e-2,
            err_msg=f"int8-KV divergence at position {i}",
        )


@pytest.mark.parametrize("arch", ["llama", "gpt2"])
def test_int8_greedy_generation_matches_native(arch):
    cfg = _tiny(arch=arch, n_kv_heads=4 if arch == "gpt2" else 2)
    cfg8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    params = init_decoder_params(cfg, seed=11)
    prompts = [[5, 9, 17, 3], [8, 2]]
    toks, mask = left_pad_batch(prompts, pad_id=cfg.eos_token_id)
    key = jax.random.PRNGKey(0)
    out_n, len_n = generate(params, jnp.asarray(toks), jnp.asarray(mask), key,
                            cfg=cfg, max_new_tokens=12)
    out_8, len_8 = generate(params, jnp.asarray(toks), jnp.asarray(mask), key,
                            cfg=cfg8, max_new_tokens=12)
    # greedy argmax is robust to ~1% logit perturbation on a random tiny
    # model in practice; token-level parity is the serving invariant
    np.testing.assert_array_equal(np.asarray(len_n), np.asarray(len_8))
    np.testing.assert_array_equal(np.asarray(out_n), np.asarray(out_8))


def test_config_roundtrip_with_kv_dtype(tmp_path):
    from youtu_rag_tpu.models.decoder import load_decoder_config, save_decoder_config

    cfg = _tiny(kv_cache_dtype="int8")
    save_decoder_config(cfg, tmp_path / "c.json")
    assert load_decoder_config(tmp_path / "c.json").kv_cache_dtype == "int8"
