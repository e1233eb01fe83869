"""Causal-LM decoder runtime: the framework's local LLM serving path.

The reference delegates EVERY chat/plan/judge LLM call to an external
OpenAI-compatible HTTP service (``utu/utils/agents_utils.py``; env contract
asserted at import, ``utu/__init__.py:8``) — the model itself is outside the
framework. This module closes that last delegated-compute slot the same way
the encoder closed the embedding-service slot: a pure-JAX, TPU-first decoder
that runs GPT-2-family and LLaMA-family checkpoints in-process.

TPU-first design:
- all layers stacked on a leading axis, forward is ``jax.lax.scan`` over
  layers — one compiled layer body regardless of depth;
- bf16 activations / f32 params cast in forward; f32 layernorm, softmax and
  logits;
- **static-shape KV cache** ``[L, B, Hkv, maxT, hd]`` carried through the
  scan — the generation loop is a single ``lax.while_loop`` under ``jit``
  (no per-token Python dispatch, no dynamic shapes; early-exits when every
  row has emitted EOS);
- left-padded batched prompts so every row appends at the same global cache
  index; per-row position ids keep RoPE / learned positions exact;
- Megatron-style TP sharding spec over a ``('dp','tp')`` mesh (attention
  heads + FFN hidden column/row-parallel, vocab-sharded embeddings) — XLA
  inserts the collectives.

Two architectures cover the open-weight checkpoint space that matters:
  "gpt2"  — learned absolute positions, fused-qkv Conv1D checkpoints,
            pre-LN, tanh GELU, tied lm_head (gpt2 / distilgpt2 / …)
  "llama" — RMSNorm, RoPE, GQA, SiLU-gated MLP (llama / tinyllama / qwen2-
            with-bias / mistral layouts via models/pretrained.py mapping)

Parity: tests/models/test_decoder.py saves random ``GPT2LMHeadModel`` /
``LlamaForCausalLM`` checkpoints and asserts logit parity vs the torch
forward, plus cache-vs-full-forward consistency and left-pad invariance.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

NEG_INF = -1e9


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32768
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    n_kv_heads: int = 12  # < n_heads = grouped-query attention
    d_ff: int = 3072
    max_len: int = 1024
    arch: str = "llama"  # "gpt2" | "llama"
    dtype: Any = jnp.bfloat16
    rope_base: float = 10000.0
    ln_eps: float = 1e-5
    tie_embeddings: bool = True
    eos_token_id: int = 0
    bos_token_id: int | None = None
    # qwen2-style checkpoints keep attention biases on q/k/v only
    qkv_bias: bool = False
    # "native" keeps K/V in the activation dtype; "int8" stores the cache
    # as per-(position, head) symmetric int8 + f32 scales — half the HBM
    # bytes of the decode loop's dominant stream at long T (the cache is
    # re-read whole every step; weights are the other stream)
    kv_cache_dtype: str = "native"

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim


def init_decoder_params(cfg: DecoderConfig, seed: int = 0) -> dict:
    """Random f32 params, per-layer tensors stacked on axis 0 (scan axis)."""
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 12)
    D, F, L, V = cfg.d_model, cfg.d_ff, cfg.n_layers, cfg.vocab_size
    KV = cfg.kv_dim
    s = 0.02

    def init(key, shape, scale=s):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(jnp.float32)

    if cfg.arch == "gpt2":
        layers = {
            "ln1_scale": jnp.ones((L, D), jnp.float32),
            "ln1_bias": jnp.zeros((L, D), jnp.float32),
            "wq": init(ks[1], (L, D, D)), "bq": jnp.zeros((L, D), jnp.float32),
            "wk": init(ks[2], (L, D, D)), "bk": jnp.zeros((L, D), jnp.float32),
            "wv": init(ks[3], (L, D, D)), "bv": jnp.zeros((L, D), jnp.float32),
            "wo": init(ks[4], (L, D, D)), "bo": jnp.zeros((L, D), jnp.float32),
            "ln2_scale": jnp.ones((L, D), jnp.float32),
            "ln2_bias": jnp.zeros((L, D), jnp.float32),
            "w1": init(ks[5], (L, D, F)), "b1": jnp.zeros((L, F), jnp.float32),
            "w2": init(ks[6], (L, F, D)), "b2": jnp.zeros((L, D), jnp.float32),
        }
        params = {
            "tok_emb": init(ks[0], (V, D)),
            "pos_emb": init(ks[7], (cfg.max_len, D)),
            "layers": layers,
            "final_ln_scale": jnp.ones((D,), jnp.float32),
            "final_ln_bias": jnp.zeros((D,), jnp.float32),
        }
    else:  # llama
        layers = {
            "ln1_scale": jnp.ones((L, D), jnp.float32),
            "wq": init(ks[1], (L, D, D)),
            "wk": init(ks[2], (L, D, KV)),
            "wv": init(ks[3], (L, D, KV)),
            "wo": init(ks[4], (L, D, D)),
            "ln2_scale": jnp.ones((L, D), jnp.float32),
            "w_gate": init(ks[8], (L, D, F)),
            "w1": init(ks[5], (L, D, F)),
            "w2": init(ks[6], (L, F, D)),
        }
        if cfg.qkv_bias:
            layers["bq"] = jnp.zeros((L, D), jnp.float32)
            layers["bk"] = jnp.zeros((L, KV), jnp.float32)
            layers["bv"] = jnp.zeros((L, KV), jnp.float32)
        params = {
            "tok_emb": init(ks[0], (V, D)),
            "layers": layers,
            "final_ln_scale": jnp.ones((D,), jnp.float32),
        }
    if not cfg.tie_embeddings:
        params["lm_head"] = init(ks[9], (D, V))
    return params


def cast_params_for_serving(params: dict, dtype=jnp.bfloat16) -> dict:
    """Cast the big matmul weights to the serving dtype, keeping norm
    scales/biases f32 (they participate in f32 norms anyway).

    Decode is HBM-bound: every step reads every weight byte once, so f32
    storage costs exactly 2x bf16 in ms/token (measured on v5e: 0.74 ms
    vs 0.37 ms at 124M params). The forward already casts per-use, so this
    only changes what lives in HBM, not the math dtypes (norms, softmax,
    and logits stay f32)."""

    def leaf(path, v):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name.startswith(("ln", "final_ln")) or name.startswith("b"):
            return v  # f32 norm params + biases: negligible bytes
        return v.astype(dtype)

    return jax.tree_util.tree_map_with_path(leaf, params)


def decoder_sharding_spec(cfg: DecoderConfig) -> dict:
    """PartitionSpec tree for a ('dp','tp') mesh — Megatron TP: q/k/v and
    FFN-in column-parallel, o and FFN-out row-parallel, vocab sharded."""
    col, row = P(None, None, "tp"), P(None, "tp", None)
    colb = P(None, "tp")
    if cfg.arch == "gpt2":
        layers = {
            "ln1_scale": P(None, None), "ln1_bias": P(None, None),
            "wq": col, "bq": colb, "wk": col, "bk": colb, "wv": col, "bv": colb,
            "wo": row, "bo": P(None, None),
            "ln2_scale": P(None, None), "ln2_bias": P(None, None),
            "w1": col, "b1": colb, "w2": row, "b2": P(None, None),
        }
        spec = {
            "tok_emb": P("tp", None),
            "pos_emb": P(None, None),
            "layers": layers,
            "final_ln_scale": P(None),
            "final_ln_bias": P(None),
        }
    else:
        layers = {
            "ln1_scale": P(None, None),
            "wq": col, "wk": col, "wv": col, "wo": row,
            "ln2_scale": P(None, None),
            "w_gate": col, "w1": col, "w2": row,
        }
        if cfg.qkv_bias:
            layers.update({"bq": colb, "bk": colb, "bv": colb})
        spec = {
            "tok_emb": P("tp", None),
            "layers": layers,
            "final_ln_scale": P(None),
        }
    if not cfg.tie_embeddings:
        spec["lm_head"] = P(None, "tp")
    return spec


# --------------------------------------------------------------- norm / rope


def _ln(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * scale + bias).astype(x.dtype)


def _rms(x, scale, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * scale).astype(x.dtype)


def _norm(x, lp_or_params, prefix, cfg: DecoderConfig):
    scale = lp_or_params[f"{prefix}_scale"]
    if cfg.arch == "gpt2":
        return _ln(x, scale, lp_or_params[f"{prefix}_bias"], cfg.ln_eps)
    return _rms(x, scale, cfg.ln_eps)


def _rope_at(x, pos_ids, base: float):
    """RoPE on [B, H, T, hd] with explicit per-row positions [B, T]
    (HF llama convention: freqs duplicated across the two halves)."""
    hd = x.shape[-1]
    half = hd // 2
    freqs = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    ang = pos_ids.astype(jnp.float32)[:, None, :, None] * freqs  # [B,1,T,half]
    cos = jnp.cos(ang).astype(x.dtype)
    sin = jnp.sin(ang).astype(x.dtype)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


# ----------------------------------------------------------------- attention


def _split_heads(y, n_heads, head_dim):
    b, t, _ = y.shape
    return y.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)


def _proj(x, lp, name, cfg):
    y = jnp.einsum("btd,de->bte", x, lp[f"w{name}"].astype(x.dtype))
    if f"b{name}" in lp:
        y = y + lp[f"b{name}"].astype(x.dtype)
    return y


def _qkv(x, lp, pos_ids, cfg: DecoderConfig):
    """Project to rotated/positioned q [B,H,T,hd] and k/v [B,Hkv,T,hd]."""
    q = _split_heads(_proj(x, lp, "q", cfg), cfg.n_heads, cfg.head_dim)
    k = _split_heads(_proj(x, lp, "k", cfg), cfg.n_kv_heads, cfg.head_dim)
    v = _split_heads(_proj(x, lp, "v", cfg), cfg.n_kv_heads, cfg.head_dim)
    if cfg.arch != "gpt2":
        q = _rope_at(q, pos_ids, cfg.rope_base)
        k = _rope_at(k, pos_ids, cfg.rope_base)
    return q, k, v


def _gqa_scores(q, k):
    """[B,H,Tq,hd] x [B,Hkv,Tk,hd] -> [B,H,Tq,Tk] with kv-head repetition."""
    b, h, tq, hd = q.shape
    hkv = k.shape[1]
    if h != hkv:
        q = q.reshape(b, hkv, h // hkv, tq, hd)
        s = jnp.einsum("bkgqd,bkvd->bkgqv", q, k, preferred_element_type=jnp.float32)
        return s.reshape(b, h, tq, k.shape[2])
    return jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)


def _gqa_mix(attn, v):
    b, h, tq, tk = attn.shape
    hkv = v.shape[1]
    if h != hkv:
        a = attn.reshape(b, hkv, h // hkv, tq, tk)
        y = jnp.einsum("bkgqv,bkvd->bkgqd", a, v)
        return y.reshape(b, h, tq, v.shape[3])
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def _attend(q, k, v, bias, cfg: DecoderConfig):
    """Masked attention; ``bias`` is an additive f32 [B, 1, Tq, Tk]."""
    scores = _gqa_scores(q, k) / np.sqrt(cfg.head_dim) + bias
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    y = _gqa_mix(attn, v)
    b, h, t, hd = y.shape
    return y.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def _mlp(h, lp, cfg: DecoderConfig):
    dt = h.dtype
    if cfg.arch == "gpt2":
        y = jnp.einsum("btd,df->btf", h, lp["w1"].astype(dt)) + lp["b1"].astype(dt)
        y = jax.nn.gelu(y, approximate=True)  # HF gelu_new
        return jnp.einsum("btf,fd->btd", y, lp["w2"].astype(dt)) + lp["b2"].astype(dt)
    g = jnp.einsum("btd,df->btf", h, lp["w_gate"].astype(dt))
    u = jnp.einsum("btd,df->btf", h, lp["w1"].astype(dt))
    return jnp.einsum("btf,fd->btd", jax.nn.silu(g) * u, lp["w2"].astype(dt))


def _logits(params, x, cfg: DecoderConfig):
    # MXU-native mixed precision: operands stay in their storage dtype
    # (bf16 when serving), accumulation is f32. An explicit .astype(f32)
    # on the vocab projection materializes a 2x-sized weight copy every
    # decode step (the largest single matrix in the model).
    x = _norm(x, params, "final_ln", cfg)
    w = params["tok_emb"].T if cfg.tie_embeddings else params["lm_head"]
    return jnp.einsum("btd,dv->btv", x, w, preferred_element_type=jnp.float32)


def _embed(params, tokens, pos_ids, cfg: DecoderConfig):
    x = params["tok_emb"].astype(cfg.dtype)[tokens]
    if cfg.arch == "gpt2":
        pos = jnp.clip(pos_ids, 0, cfg.max_len - 1)
        x = x + params["pos_emb"].astype(cfg.dtype)[pos]
    return x


def position_ids_from_mask(mask: jax.Array) -> jax.Array:
    """Per-row position ids under left padding: pads get 0, the first real
    token gets 0, and positions count up from there ([B, T] int32)."""
    m = mask.astype(jnp.int32)
    return jnp.maximum(jnp.cumsum(m, axis=-1) - 1, 0)


def causal_logits(
    params: dict,
    tokens: jax.Array,
    mask: jax.Array,
    cfg: DecoderConfig,
    remat: bool = False,
) -> jax.Array:
    """Full teacher-forced forward → [B, T, vocab] f32 logits.

    The parity/training/prefill-reference path: one causal pass, no cache.
    ``mask`` is 1 for real tokens (left- or right-padded both work; positions
    derive from the mask). ``remat=True`` checkpoints each layer — without
    it the backward pass keeps every layer's [B,H,T,T] f32 attention matrix
    live (1 GB/layer at B=32 T=1024: an 8-layer 9M-param model OOMed a
    16 GB chip)."""
    b, t = tokens.shape
    pos_ids = position_ids_from_mask(mask)
    x = _embed(params, tokens, pos_ids, cfg)
    causal = jnp.tril(jnp.ones((t, t), jnp.float32))[None, None]
    pad = mask.astype(jnp.float32)[:, None, None, :]
    bias = (1.0 - causal * pad) * NEG_INF

    def layer(x, lp):
        h = _norm(x, lp, "ln1", cfg)
        q, k, v = _qkv(h, lp, pos_ids, cfg)
        a = _attend(q, k, v, bias, cfg)
        a = jnp.einsum("bte,ed->btd", a, lp["wo"].astype(x.dtype))
        if "bo" in lp:
            a = a + lp["bo"].astype(x.dtype)
        x = x + a
        x = x + _mlp(_norm(x, lp, "ln2", cfg), lp, cfg)
        return x, None

    body = jax.checkpoint(layer) if remat else layer
    x, _ = jax.lax.scan(body, x, params["layers"])
    return _logits(params, x, cfg)


# ------------------------------------------------------------------ KV cache


def init_cache(cfg: DecoderConfig, batch: int, max_len: int | None = None) -> dict:
    """Static-shape KV cache [L, B, Hkv, maxT, hd].

    ``cfg.kv_cache_dtype == "int8"`` stores int8 values + f32 per-(L, B,
    Hkv, T) scales (scale overhead 4/hd bytes per element — 3-8%); decode
    dequantizes after the HBM read, so the cache stream halves."""
    t = max_len or cfg.max_len
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, t, cfg.head_dim)
    if cfg.kv_cache_dtype == "int8":
        sshape = shape[:-1]
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v_scale": jnp.zeros(sshape, jnp.float32),
        }
    return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}


def cache_sharding_spec(cfg: DecoderConfig | None = None) -> dict:
    """KV heads over 'tp', batch over 'dp' — matches decoder_sharding_spec."""
    spec = {"k": P(None, "dp", "tp", None, None), "v": P(None, "dp", "tp", None, None)}
    if cfg is not None and cfg.kv_cache_dtype == "int8":
        spec["k_scale"] = P(None, "dp", "tp", None)
        spec["v_scale"] = P(None, "dp", "tp", None)
    return spec


def _quantize_kv(x: jax.Array):
    """[..., T, hd] → (int8 values, f32 per-[..., T] scales), symmetric."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _dequantize_kv(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    # scale in the target dtype keeps the multiply fusable into the dot's
    # operand stream (no f32 upcast of the whole cache)
    return q.astype(dtype) * scale[..., None].astype(dtype)


def prefill(
    params: dict,
    tokens: jax.Array,
    mask: jax.Array,
    cache: dict,
    cfg: DecoderConfig,
) -> tuple[jax.Array, dict]:
    """Causal pass over the (left-padded) prompt, writing K/V into
    ``cache[:, :, :, :T]``. Returns (last-position logits [B, V], cache)."""
    b, t = tokens.shape
    pos_ids = position_ids_from_mask(mask)
    x = _embed(params, tokens, pos_ids, cfg)
    causal = jnp.tril(jnp.ones((t, t), jnp.float32))[None, None]
    pad = mask.astype(jnp.float32)[:, None, None, :]
    bias = (1.0 - causal * pad) * NEG_INF

    int8_kv = cfg.kv_cache_dtype == "int8"

    def layer(x, lp_kc):
        lp, kc, vc = lp_kc[:3]
        h = _norm(x, lp, "ln1", cfg)
        q, k, v = _qkv(h, lp, pos_ids, cfg)
        if int8_kv:
            ksc, vsc = lp_kc[3], lp_kc[4]
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            kc = jax.lax.dynamic_update_slice(kc, kq, (0, 0, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, vq, (0, 0, 0, 0))
            ksc = jax.lax.dynamic_update_slice(ksc, ks, (0, 0, 0))
            vsc = jax.lax.dynamic_update_slice(vsc, vs, (0, 0, 0))
            written = (kc, vc, ksc, vsc)
        else:
            kc = jax.lax.dynamic_update_slice(kc, k, (0, 0, 0, 0))
            vc = jax.lax.dynamic_update_slice(vc, v, (0, 0, 0, 0))
            written = (kc, vc)
        # attention uses the full-precision k/v just computed — prefill
        # quality is unaffected by the cache quantization
        a = _attend(q, k, v, bias, cfg)
        a = jnp.einsum("bte,ed->btd", a, lp["wo"].astype(x.dtype))
        if "bo" in lp:
            a = a + lp["bo"].astype(x.dtype)
        x = x + a
        x = x + _mlp(_norm(x, lp, "ln2", cfg), lp, cfg)
        return x, written

    if int8_kv:
        xs = (params["layers"], cache["k"], cache["v"],
              cache["k_scale"], cache["v_scale"])
        x, (kc, vc, ksc, vsc) = jax.lax.scan(layer, x, xs)
        new_cache = {"k": kc, "v": vc, "k_scale": ksc, "v_scale": vsc}
    else:
        x, (kc, vc) = jax.lax.scan(layer, x, (params["layers"], cache["k"], cache["v"]))
        new_cache = {"k": kc, "v": vc}
    logits = _logits(params, x[:, -1:, :], cfg)[:, 0]
    return logits, new_cache


def decode_step(
    params: dict,
    token: jax.Array,  # [B] int32 — tokens just emitted
    t_index: jax.Array,  # scalar int32 — global cache slot to write
    attn_mask: jax.Array,  # [B, maxT] f32 — 1 for every valid cache slot ≤ t
    pos_ids: jax.Array,  # [B] int32 — per-row position of `token`
    cache: dict,
    cfg: DecoderConfig,
) -> tuple[jax.Array, dict]:
    """One token for every row → (logits [B, V] f32, updated cache).

    Left padding makes ``t_index`` a single scalar for the whole batch; the
    pad slots stay masked via ``attn_mask`` forever."""
    x = _embed(params, token[:, None], pos_ids[:, None], cfg)
    bias = (1.0 - attn_mask.astype(jnp.float32))[:, None, None, :] * NEG_INF

    # The full [L,...] cache rides the scan CARRY and takes one-token
    # dynamic_update_slice writes in place. Passing it as scan xs/ys
    # instead (the obvious structure) makes XLA restack the ENTIRE cache
    # every layer every token — measured 3.3x slower at batch 32 on v5e
    # (4.8 ms/step vs 1.45 ms; cache-write traffic, not attention reads).
    int8_kv = cfg.kv_cache_dtype == "int8"

    def layer(carry, lp_i):
        x, kc_all, vc_all, ksc_all, vsc_all = carry
        lp, i = lp_i
        h = _norm(x, lp, "ln1", cfg)
        q, k, v = _qkv(h, lp, pos_ids[:, None], cfg)
        if int8_kv:
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            kc_all = jax.lax.dynamic_update_slice(
                kc_all, kq[None], (i, 0, 0, t_index, 0)
            )
            vc_all = jax.lax.dynamic_update_slice(
                vc_all, vq[None], (i, 0, 0, t_index, 0)
            )
            ksc_all = jax.lax.dynamic_update_slice(
                ksc_all, ks[None], (i, 0, 0, t_index)
            )
            vsc_all = jax.lax.dynamic_update_slice(
                vsc_all, vs[None], (i, 0, 0, t_index)
            )
            kc = _dequantize_kv(
                jax.lax.dynamic_index_in_dim(kc_all, i, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(ksc_all, i, 0, keepdims=False),
                q.dtype,
            )
            vc = _dequantize_kv(
                jax.lax.dynamic_index_in_dim(vc_all, i, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(vsc_all, i, 0, keepdims=False),
                q.dtype,
            )
        else:
            kc_all = jax.lax.dynamic_update_slice(
                kc_all, k[None], (i, 0, 0, t_index, 0)
            )
            vc_all = jax.lax.dynamic_update_slice(
                vc_all, v[None], (i, 0, 0, t_index, 0)
            )
            kc = jax.lax.dynamic_index_in_dim(kc_all, i, 0, keepdims=False)
            vc = jax.lax.dynamic_index_in_dim(vc_all, i, 0, keepdims=False)
        a = _attend(q, kc, vc, bias, cfg)
        a = jnp.einsum("bte,ed->btd", a, lp["wo"].astype(x.dtype))
        if "bo" in lp:
            a = a + lp["bo"].astype(x.dtype)
        x = x + a
        x = x + _mlp(_norm(x, lp, "ln2", cfg), lp, cfg)
        return (x, kc_all, vc_all, ksc_all, vsc_all), None

    # a 0-size placeholder keeps the carry structure static for both modes
    ksc0 = cache.get("k_scale", jnp.zeros((0,), jnp.float32))
    vsc0 = cache.get("v_scale", jnp.zeros((0,), jnp.float32))
    (x, kc, vc, ksc, vsc), _ = jax.lax.scan(
        layer,
        (x, cache["k"], cache["v"], ksc0, vsc0),
        (params["layers"], jnp.arange(cfg.n_layers)),
    )
    new_cache = {"k": kc, "v": vc}
    if int8_kv:
        new_cache["k_scale"] = ksc
        new_cache["v_scale"] = vsc
    return _logits(params, x, cfg)[:, 0], new_cache


# ----------------------------------------------------------------- sampling


def sample_token(
    logits: jax.Array,  # [B, V] f32
    key: jax.Array,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """Greedy (temperature 0) or temperature/top-k/top-p sampling, [B] int32.

    All branches are trace-time constants (Python floats/ints), so each
    sampling config compiles once — no data-dependent control flow."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob ≥ top_p (keep the first token)
        cutoff_idx = jnp.sum((cum - probs) < top_p, axis=-1) - 1
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, NEG_INF, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------- generation


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "temperature", "top_k", "top_p"),
)
def generate(
    params: dict,
    prompt: jax.Array,  # [B, Tp] int32, LEFT-padded
    prompt_mask: jax.Array,  # [B, Tp] — 1 for real tokens
    key: jax.Array,
    cfg: DecoderConfig,
    max_new_tokens: int = 128,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Prefill + single-jit decode loop → (tokens [B, max_new], lengths [B]).

    Rows stop at ``cfg.eos_token_id``; once every row is done the while_loop
    exits early (dispatch cost stays proportional to the longest row, not to
    ``max_new_tokens``). Output after a row's EOS is padded with EOS."""
    b, tp = prompt.shape
    total = tp + max_new_tokens
    cache = init_cache(cfg, b, total)
    logits, cache = prefill(params, prompt, prompt_mask, cache, cfg)

    attn_mask0 = jnp.concatenate(
        [prompt_mask.astype(jnp.float32), jnp.zeros((b, max_new_tokens), jnp.float32)],
        axis=-1,
    )
    pos0 = jnp.sum(prompt_mask.astype(jnp.int32), axis=-1)  # next position id
    out0 = jnp.full((b, max_new_tokens), cfg.eos_token_id, jnp.int32)
    done0 = jnp.zeros((b,), bool)

    def cond(state):
        step, _, _, _, _, _, _, done = state
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, logits, cache, attn_mask, pos, out, k, done = state
        k, sub = jax.random.split(k)
        tok = sample_token(logits, sub, temperature, top_k, top_p)
        tok = jnp.where(done, cfg.eos_token_id, tok)
        out = jax.lax.dynamic_update_slice(out, tok[:, None], (0, step))
        done = done | (tok == cfg.eos_token_id)
        t_index = tp + step
        attn_mask = jax.lax.dynamic_update_slice(
            attn_mask, jnp.ones((b, 1), jnp.float32), (0, t_index)
        )
        logits, cache = decode_step(
            params, tok, t_index, attn_mask, pos + step, cache, cfg
        )
        return step + 1, logits, cache, attn_mask, pos, out, k, done

    state = (jnp.int32(0), logits, cache, attn_mask0, pos0, out0, key, done0)
    _, _, _, _, _, out, _, done = jax.lax.while_loop(cond, body, state)
    is_eos = out == cfg.eos_token_id
    first_eos = jnp.argmax(is_eos, axis=-1)
    lengths = jnp.where(jnp.any(is_eos, axis=-1), first_eos, max_new_tokens)
    return out, lengths


def save_decoder_config(cfg: DecoderConfig, path) -> None:
    """Persist a DecoderConfig as JSON next to native npz weights (the
    in-repo-trained-checkpoint format, mirroring encoder_config.json)."""
    import dataclasses
    import json

    d = dataclasses.asdict(cfg)
    d["dtype"] = jnp.dtype(cfg.dtype).name
    with open(path, "w") as f:
        json.dump(d, f, indent=1)


def load_decoder_config(path) -> DecoderConfig:
    import json

    with open(path) as f:
        d = json.load(f)
    if isinstance(d.get("dtype"), str):
        d["dtype"] = jnp.dtype(d["dtype"]).type
    return DecoderConfig(**d)


def left_pad_batch(
    seqs: list[list[int]], pad_id: int, bucket: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Left-pad variable-length prompts into [B, T] (+mask), with T rounded
    to the next power of two so prompt shapes hit a bounded jit-cache
    (CLAUDE.md static-shape invariant)."""
    longest = max(1, max(len(s) for s in seqs))
    t = 1 << (longest - 1).bit_length() if bucket else longest
    toks = np.full((len(seqs), t), pad_id, np.int32)
    mask = np.zeros((len(seqs), t), np.float32)
    for i, s in enumerate(seqs):
        if s:
            toks[i, t - len(s):] = np.asarray(s, np.int32)
            mask[i, t - len(s):] = 1.0
    return toks, mask
