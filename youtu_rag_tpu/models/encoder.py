"""Functional transformer encoder trunk (embedder + reranker backbone).

Pure-JAX, TPU-first:
- params are a flat pytree with all layers **stacked on a leading axis** and
  the forward pass is a ``jax.lax.scan`` over layers — one compiled layer
  body regardless of depth (fast compiles, XLA pipelines the scan);
- bf16 activations with f32 params (cast in forward), f32 layernorm/softmax
  accumulation — MXU-friendly;
- rotary position embeddings (no learned position table → no max-len
  coupling in the params);
- mean-pool over the attention mask + L2 normalize = embedding; a scalar
  head over the CLS position = rerank score.

Sharding: ``param_sharding_spec`` returns a PartitionSpec tree for a
``('dp', 'tp')`` mesh — attention heads and FFN hidden sharded over 'tp',
everything else replicated; batch sharded over 'dp'. XLA inserts the
collectives (scaling-book recipe §"mesh + annotate + let XLA insert").

The reference has no counterpart (embeddings are remote HTTP calls,
``service_embedder.py:16-177``); this module is what makes the framework
self-contained on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 32768
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    max_len: int = 512
    out_dim: int = 768  # embedding dimension (projection from d_model)
    dtype: Any = jnp.bfloat16
    rope_base: float = 10000.0
    # attention path: "xla" (training + CPU), "pallas" (inference on TPU —
    # blockwise kernel, no HBM score materialization), "pallas_interpret"
    attention_impl: str = "xla"


    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads


def init_encoder_params(cfg: EncoderConfig, seed: int = 0) -> dict:
    """Initialize f32 params. Layer weights stacked on axis 0 (scan axis)."""
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 12)
    D, F, L, V = cfg.d_model, cfg.d_ff, cfg.n_layers, cfg.vocab_size
    s_attn = 1.0 / np.sqrt(D)
    s_ff = 1.0 / np.sqrt(F)

    def init(key, shape, scale):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(jnp.float32)

    return {
        "tok_emb": init(ks[0], (V, D), 0.02),
        "layers": {
            "ln1_scale": jnp.ones((L, D), jnp.float32),
            "ln1_bias": jnp.zeros((L, D), jnp.float32),
            "wq": init(ks[1], (L, D, D), s_attn),
            "wk": init(ks[2], (L, D, D), s_attn),
            "wv": init(ks[3], (L, D, D), s_attn),
            "wo": init(ks[4], (L, D, D), s_attn),
            "ln2_scale": jnp.ones((L, D), jnp.float32),
            "ln2_bias": jnp.zeros((L, D), jnp.float32),
            "w1": init(ks[5], (L, D, F), s_attn),
            "b1": jnp.zeros((L, F), jnp.float32),
            "w2": init(ks[6], (L, F, D), s_ff),
            "b2": jnp.zeros((L, D), jnp.float32),
        },
        "final_ln_scale": jnp.ones((D,), jnp.float32),
        "final_ln_bias": jnp.zeros((D,), jnp.float32),
        "out_proj": init(ks[7], (D, cfg.out_dim), s_attn),
        "score_head": init(ks[8], (D, 1), s_attn),
    }


def count_params(params: dict) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def save_params_npz(params: dict, path) -> None:
    """Persist a param tree as one npz ('/'-joined nested keys).

    The deployment format: `TpuEmbedder(params=load_params_npz(p))` serves a
    finetuned encoder; orbax checkpoints (models/checkpoint.py) remain the
    in-training format with optimizer state."""
    flat: dict[str, np.ndarray] = {}

    def walk(prefix: str, node) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez_compressed(path, **flat)


def load_params_npz(path) -> dict:
    data = np.load(path)
    out: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return out


def param_sharding_spec(cfg: EncoderConfig) -> dict:
    """PartitionSpec tree for a ('dp','tp') mesh: Megatron-style TP.

    wq/wk/wv and w1 column-parallel (output dim over 'tp'); wo and w2
    row-parallel (input dim over 'tp'); embeddings sharded on vocab."""
    return {
        "tok_emb": P("tp", None),
        "layers": {
            "ln1_scale": P(None, None),
            "ln1_bias": P(None, None),
            "wq": P(None, None, "tp"),
            "wk": P(None, None, "tp"),
            "wv": P(None, None, "tp"),
            "wo": P(None, "tp", None),
            "ln2_scale": P(None, None),
            "ln2_bias": P(None, None),
            "w1": P(None, None, "tp"),
            "b1": P(None, "tp"),
            "w2": P(None, "tp", None),
            "b2": P(None, None),
        },
        "final_ln_scale": P(None),
        "final_ln_bias": P(None),
        "out_proj": P(None, "tp"),
        "score_head": P(None, None),
    }


def _layer_norm(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _rope(x, base: float, pos_offset=0):
    """Rotary embedding over the last dim of [B, H, T, hd].

    ``pos_offset`` shifts positions — the sequence-parallel path passes
    each shard's global start so rotations match the unsharded forward."""
    _, _, t, hd = x.shape
    half = hd // 2
    freqs = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    pos = jnp.arange(t, dtype=jnp.float32) + pos_offset
    ang = pos[:, None] * freqs[None, :]  # [T, half]
    cos = jnp.cos(ang)[None, None, :, :].astype(x.dtype)
    sin = jnp.sin(ang)[None, None, :, :].astype(x.dtype)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)


def _ffn(h, lp, dt):
    """Position-wise FFN block (shared by the dense, pipeline and
    sequence-parallel layer bodies — keep in sync in ONE place)."""
    h = jnp.einsum("btd,df->btf", h, lp["w1"].astype(dt)) + lp["b1"].astype(dt)
    h = jax.nn.gelu(h)
    return jnp.einsum("btf,fd->btd", h, lp["w2"].astype(dt)) + lp["b2"].astype(dt)


def masked_pool_sums(x, mask):
    """Masked token sums + counts (f32) — the reducible half of pooling;
    sequence parallelism psums these across the ring before dividing."""
    m = mask.astype(jnp.float32)[:, :, None]
    return jnp.sum(x.astype(jnp.float32) * m, axis=1), jnp.sum(m, axis=1)


def pool_project(params, summed, count):
    """Mean-pool from (sums, counts) → out_proj → L2 normalize (f32).
    The single definition of the embedding epilogue for every
    parallelism variant (dense/sp/pp/ep)."""
    pooled = summed / jnp.maximum(count, 1.0)
    emb = pooled @ params["out_proj"]
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)


def _attention(x, mask, wq, wk, wv, wo, cfg: EncoderConfig):
    b, t, d = x.shape
    h, hd = cfg.n_heads, cfg.head_dim

    def proj(w):
        y = jnp.einsum("btd,de->bte", x, w.astype(x.dtype))
        return y.reshape(b, t, h, hd).transpose(0, 2, 1, 3)  # [B, H, T, hd]

    q = _rope(proj(wq), cfg.rope_base)
    k = _rope(proj(wk), cfg.rope_base)
    v = proj(wv)
    # measured on v5e (b4·h12·hd64 bf16): XLA 3.6/14.4 ms at T=2k/4k,
    # blockwise 0.94/3.1 ms; blockwise fails to compile at T≥8k (the
    # [block_q, T] f32 score row outgrows VMEM) where flash runs 6.0 ms
    # (8k) / 24.1 ms (16k). So: XLA < 256 ≤ blockwise ≤ 4k < flash.
    if cfg.attention_impl != "xla" and t >= 256 and t % 128 == 0 and hd % 64 == 0:
        interpret = cfg.attention_impl == "pallas_interpret"
        bias2d = (1.0 - mask.astype(jnp.float32)) * -1e9  # [B, T]
        use_flash = cfg.attention_impl == "flash" or (
            cfg.attention_impl == "pallas" and t > 4096
        )
        if use_flash:
            from ..ops.attention import flash_attention

            y = flash_attention(q, k, v, bias2d, interpret=interpret)
        else:
            from ..ops.attention import blockwise_attention

            y = blockwise_attention(
                q, k, v, bias2d, block_q=min(256, t), interpret=interpret
            )
    else:
        mask_bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * -1e9
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(hd) + mask_bias  # [B, 1, 1, T] bias broadcast
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    y = y.transpose(0, 2, 1, 3).reshape(b, t, d)
    return jnp.einsum("btd,de->bte", y, wo.astype(x.dtype))


def encode_tokens(
    params: dict, token_ids: jax.Array, mask: jax.Array, cfg: EncoderConfig
) -> tuple[jax.Array, jax.Array]:
    """Forward pass.

    Args:
      token_ids: [B, T] int32
      mask:      [B, T] float (1 = real token)
    Returns:
      (embeddings [B, out_dim] f32 L2-normalized, cls_state [B, d_model] f32)
    """
    dt = cfg.dtype
    x = params["tok_emb"].astype(dt)[token_ids]  # [B, T, D]

    def layer(x, lp):
        h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        x = x + _attention(h, mask, lp["wq"], lp["wk"], lp["wv"], lp["wo"], cfg)
        h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        return x + _ffn(h, lp, dt), None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    x = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"])

    # mean pool over mask → project → L2 normalize (f32 for stability)
    emb = pool_project(params, *masked_pool_sums(x, mask))
    cls = x[:, 0, :].astype(jnp.float32)
    return emb, cls


def rerank_scores(params: dict, token_ids: jax.Array, mask: jax.Array, cfg: EncoderConfig) -> jax.Array:
    """Cross-encoder relevance scores [B] from the CLS state."""
    _, cls = encode_tokens(params, token_ids, mask, cfg)
    return (cls @ params["score_head"])[:, 0]
