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
    # architecture family:
    #   "preln_rope" — this repo's native trunk (pre-LN, RoPE, no attn
    #                  biases, mean-pool + out_proj);
    #   "bert"       — HF BERT-family layout (post-LN, learned absolute
    #                  positions + token types, attention biases, erf GELU)
    #                  so pretrained bge/gte/e5-style safetensors weights
    #                  run natively (models/pretrained.py loads them).
    arch: str = "preln_rope"
    pooling: str = "mean"  # "mean" | "cls" (bert embedding models vary)
    # lexical residual pathway (preln_rope only): a learned token-importance
    # weight (softplus, IDF-initializable) over the *input* token embeddings,
    # pooled and projected alongside the contextual mean-pool, blended by a
    # learned gate. Token identity survives pooling by construction — the
    # property that lets a trained dense encoder carry exact-identifier
    # queries (needle fixtures) that pure contextual mean-pooling washes out.
    lex_pool: bool = False
    # > 0 switches the lexical half from a dense projection to a SPARSE
    # hashed-bucket bag-of-words channel concatenated onto the embedding:
    # bucket = token_id % lex_buckets, value = softplus(tok_weight) summed
    # per bucket, log1p tf-compression. Dense random projections put
    # ~N(0, 1/d) cross-talk between every (query token, chunk token) pair —
    # at 200-token chunks that noise buries a single needle token; disjoint
    # buckets have exactly zero cross-talk (collisions aside), which is the
    # property exact-identifier recall needs. The embedding stays one f32
    # vector of size out_dim + lex_buckets.
    lex_buckets: int = 0
    # initial lexical-gate value (probability space). The sparse channel
    # must DOMINATE ranking out of domain: contextual cosines of a trained
    # encoder compress on unseen corpora (every chunk looks alike), and at
    # a 50/50 gate that near-constant-plus-jitter drowns the lexical
    # margin. Measured on the needle fixtures: two-stage recall@all 0.484
    # at g=0.5 → 0.871 at g=0.85 with identical weights. Trained further
    # end-to-end from this init.
    lex_gate_init: float = 0.85
    ln_eps: float = 1e-6  # bert checkpoints use 1e-12
    type_vocab_size: int = 2  # bert token-type (segment) vocabulary
    gelu_approximate: bool = True  # HF "gelu" is the exact erf form


    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    @property
    def embed_dim(self) -> int:
        """Final embedding dimension (out_dim + the sparse lexical channel)."""
        return self.out_dim + (self.lex_buckets if self.lex_pool else 0)


def init_encoder_params(cfg: EncoderConfig, seed: int = 0) -> dict:
    """Initialize f32 params. Layer weights stacked on axis 0 (scan axis)."""
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 12)
    D, F, L, V = cfg.d_model, cfg.d_ff, cfg.n_layers, cfg.vocab_size
    s_attn = 1.0 / np.sqrt(D)
    s_ff = 1.0 / np.sqrt(F)

    def init(key, shape, scale):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(jnp.float32)

    if cfg.arch == "bert":
        return {
            "tok_emb": init(ks[0], (V, D), 0.02),
            "pos_emb": init(ks[9], (cfg.max_len, D), 0.02),
            "type_emb": init(ks[10], (cfg.type_vocab_size, D), 0.02),
            "emb_ln_scale": jnp.ones((D,), jnp.float32),
            "emb_ln_bias": jnp.zeros((D,), jnp.float32),
            "layers": {
                "wq": init(ks[1], (L, D, D), s_attn),
                "bq": jnp.zeros((L, D), jnp.float32),
                "wk": init(ks[2], (L, D, D), s_attn),
                "bk": jnp.zeros((L, D), jnp.float32),
                "wv": init(ks[3], (L, D, D), s_attn),
                "bv": jnp.zeros((L, D), jnp.float32),
                "wo": init(ks[4], (L, D, D), s_attn),
                "bo": jnp.zeros((L, D), jnp.float32),
                "ln1_scale": jnp.ones((L, D), jnp.float32),
                "ln1_bias": jnp.zeros((L, D), jnp.float32),
                "w1": init(ks[5], (L, D, F), s_attn),
                "b1": jnp.zeros((L, F), jnp.float32),
                "w2": init(ks[6], (L, F, D), s_ff),
                "b2": jnp.zeros((L, D), jnp.float32),
                "ln2_scale": jnp.ones((L, D), jnp.float32),
                "ln2_bias": jnp.zeros((L, D), jnp.float32),
            },
            "score_head": init(ks[8], (D, 1), s_attn),
        }
    lex = {}
    if cfg.lex_pool:
        g0 = min(max(cfg.lex_gate_init, 1e-4), 1 - 1e-4)
        lex = {
            "tok_weight": jnp.zeros((V,), jnp.float32),
            "lex_mix": jnp.asarray(np.log(g0 / (1 - g0)), jnp.float32),
        }
        if not cfg.lex_buckets:
            lex["lex_proj"] = init(ks[11], (D, cfg.out_dim), s_attn)
    return {
        "tok_emb": init(ks[0], (V, D), 0.02),
        **lex,
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


def save_encoder_config(cfg: EncoderConfig, path) -> None:
    """Persist an EncoderConfig as JSON next to the weights so serving
    reconstructs the exact architecture (incl. lex_pool) from a dir."""
    import dataclasses
    import json

    d = dataclasses.asdict(cfg)
    d["dtype"] = jnp.dtype(cfg.dtype).name
    with open(path, "w") as f:
        json.dump(d, f, indent=1)


def load_encoder_config(path) -> EncoderConfig:
    import json

    with open(path) as f:
        d = json.load(f)
    if isinstance(d.get("dtype"), str):
        d["dtype"] = jnp.dtype(d["dtype"]).type
    return EncoderConfig(**d)


def param_sharding_spec(cfg: EncoderConfig) -> dict:
    """PartitionSpec tree for a ('dp','tp') mesh: Megatron-style TP.

    wq/wk/wv and w1 column-parallel (output dim over 'tp'); wo and w2
    row-parallel (input dim over 'tp'); embeddings sharded on vocab."""
    if cfg.arch == "bert":
        return {
            "tok_emb": P("tp", None),
            "pos_emb": P(None, None),
            "type_emb": P(None, None),
            "emb_ln_scale": P(None),
            "emb_ln_bias": P(None),
            "layers": {
                "wq": P(None, None, "tp"), "bq": P(None, "tp"),
                "wk": P(None, None, "tp"), "bk": P(None, "tp"),
                "wv": P(None, None, "tp"), "bv": P(None, "tp"),
                "wo": P(None, "tp", None), "bo": P(None, None),
                "ln1_scale": P(None, None), "ln1_bias": P(None, None),
                "w1": P(None, None, "tp"), "b1": P(None, "tp"),
                "w2": P(None, "tp", None), "b2": P(None, None),
                "ln2_scale": P(None, None), "ln2_bias": P(None, None),
            },
            "score_head": P(None, None),
        }
    lex = {}
    if cfg.lex_pool:
        lex = {"tok_weight": P(None), "lex_mix": P()}
        if not cfg.lex_buckets:
            lex["lex_proj"] = P(None, "tp")
    return {
        "tok_emb": P("tp", None),
        **lex,
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


def _ffn(h, lp, dt, approximate: bool = True):
    """Position-wise FFN block (shared by the dense, pipeline and
    sequence-parallel layer bodies — keep in sync in ONE place).
    ``approximate=False`` selects the exact erf GELU (HF BERT parity)."""
    h = jnp.einsum("btd,df->btf", h, lp["w1"].astype(dt)) + lp["b1"].astype(dt)
    h = jax.nn.gelu(h, approximate=approximate)
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


def _attention_core(q, k, v, mask, cfg: EncoderConfig):
    """Scaled-dot-product attention from projected heads [B, H, T, hd].

    Kernel dispatch shared by every arch/parallelism variant:
    measured on v5e (b4·h12·hd64 bf16): XLA 3.6/14.4 ms at T=2k/4k,
    blockwise 0.94/3.1 ms; blockwise fails to compile at T≥8k (the
    [block_q, T] f32 score row outgrows VMEM) where flash runs 6.0 ms
    (8k) / 24.1 ms (16k). So: XLA < 256 ≤ blockwise ≤ 4k < flash."""
    _, _, t, hd = q.shape
    if cfg.attention_impl != "xla" and t >= 256 and t % 128 == 0 and hd % 64 == 0:
        interpret = cfg.attention_impl == "pallas_interpret"
        bias2d = (1.0 - mask.astype(jnp.float32)) * -1e9  # [B, T]
        use_flash = cfg.attention_impl == "flash" or (
            cfg.attention_impl == "pallas" and t > 4096
        )
        if use_flash:
            from ..ops.attention import flash_attention

            return flash_attention(q, k, v, bias2d, interpret=interpret)
        from ..ops.attention import blockwise_attention

        return blockwise_attention(
            q, k, v, bias2d, block_q=min(256, t), interpret=interpret
        )
    mask_bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * -1e9
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / np.sqrt(hd) + mask_bias  # [B, 1, 1, T] bias broadcast
    attn = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def _attention(x, mask, wq, wk, wv, wo, cfg: EncoderConfig):
    b, t, d = x.shape
    h, hd = cfg.n_heads, cfg.head_dim

    def proj(w):
        y = jnp.einsum("btd,de->bte", x, w.astype(x.dtype))
        return y.reshape(b, t, h, hd).transpose(0, 2, 1, 3)  # [B, H, T, hd]

    q = _rope(proj(wq), cfg.rope_base)
    k = _rope(proj(wk), cfg.rope_base)
    v = proj(wv)
    y = _attention_core(q, k, v, mask, cfg)
    y = y.transpose(0, 2, 1, 3).reshape(b, t, d)
    return jnp.einsum("btd,de->bte", y, wo.astype(x.dtype))


def _bert_attention(x, mask, lp, cfg: EncoderConfig):
    """BERT-family attention: biased q/k/v/o projections, no RoPE
    (positions are learned absolute embeddings added at the input)."""
    b, t, d = x.shape
    h, hd = cfg.n_heads, cfg.head_dim

    def proj(w, bias):
        y = jnp.einsum("btd,de->bte", x, w.astype(x.dtype)) + bias.astype(x.dtype)
        return y.reshape(b, t, h, hd).transpose(0, 2, 1, 3)

    q = proj(lp["wq"], lp["bq"])
    k = proj(lp["wk"], lp["bk"])
    v = proj(lp["wv"], lp["bv"])
    y = _attention_core(q, k, v, mask, cfg)
    y = y.transpose(0, 2, 1, 3).reshape(b, t, d)
    return jnp.einsum("btd,de->bte", y, lp["wo"].astype(x.dtype)) + lp["bo"].astype(x.dtype)


def encode_tokens(
    params: dict,
    token_ids: jax.Array,
    mask: jax.Array,
    cfg: EncoderConfig,
    type_ids: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Forward pass.

    Args:
      token_ids: [B, T] int32
      mask:      [B, T] float (1 = real token)
      type_ids:  [B, T] int32 segment ids (bert arch only; None = all 0)
    Returns:
      (embeddings [B, out_dim] f32 L2-normalized, cls_state [B, d_model] f32)
    """
    if cfg.arch == "bert":
        return _bert_encode(params, token_ids, mask, cfg, type_ids)
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
    if cfg.lex_pool and cfg.lex_buckets:
        emb = _lex_bucket_concat(params, token_ids, mask, cfg, *masked_pool_sums(x, mask))
    elif cfg.lex_pool and "lex_proj" in params:
        emb = _lex_blend(params, token_ids, mask, *masked_pool_sums(x, mask))
    else:
        emb = pool_project(params, *masked_pool_sums(x, mask))
    cls = x[:, 0, :].astype(jnp.float32)
    return emb, cls


def _lex_blend(params, token_ids, mask, summed, count):
    """Blend the contextual mean-pool with a learned-importance lexical pool
    of the *input* token embeddings (see ``EncoderConfig.lex_pool``).

    Both components L2-normalize before a sigmoid-gated convex blend, so the
    final cosine is (approximately) the gate-weighted sum of a contextual
    cosine and a lexical bag-of-subwords cosine. ``tok_weight`` is softplus-
    activated — IDF-initialized by the trainer — so frequent/special tokens
    can be driven to ~zero influence while rare identifier subwords dominate
    the lexical half."""
    w = jax.nn.softplus(params["tok_weight"].astype(jnp.float32))[token_ids]
    w = w * mask.astype(jnp.float32)  # [B, T]
    tokv = params["tok_emb"].astype(jnp.float32)[token_ids]  # [B, T, D]
    lex = jnp.einsum("bt,btd->bd", w, tokv) / jnp.maximum(
        jnp.sum(w, axis=-1, keepdims=True), 1e-6
    )
    ctx = (summed / jnp.maximum(count, 1.0)) @ params["out_proj"]
    lex = lex @ params["lex_proj"]

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    g = jax.nn.sigmoid(params["lex_mix"].astype(jnp.float32))
    return norm((1.0 - g) * norm(ctx) + g * norm(lex))


def _lex_bucket_concat(params, token_ids, mask, cfg: EncoderConfig, summed, count):
    """Sparse lexical channel (``EncoderConfig.lex_buckets``): a learned-
    weight hashed bag-of-words concatenated onto the contextual embedding.

    cos(final) blends the contextual cosine and the bucket-BOW cosine with
    gate weights (1-g)²/g² — one dense vector, two retrieval behaviors.
    The bucket half is the hash embedder's geometry (zero cross-token
    noise, log-tf) upgraded with *learned* per-token IDF weights; the
    contextual half carries paraphrase semantics the BOW cannot."""
    K = cfg.lex_buckets
    w = jax.nn.softplus(params["tok_weight"].astype(jnp.float32))[token_ids]
    w = w * mask.astype(jnp.float32)  # [B, T]
    onehot = jax.nn.one_hot(token_ids % K, K, dtype=jnp.float32)  # [B, T, K]
    lex = jnp.log1p(jnp.einsum("btk,bt->bk", onehot, w))  # weighted tf-log BOW

    ctx = (summed / jnp.maximum(count, 1.0)) @ params["out_proj"]

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    g = jax.nn.sigmoid(params["lex_mix"].astype(jnp.float32))
    emb = jnp.concatenate([(1.0 - g) * norm(ctx), g * norm(lex)], axis=-1)
    return norm(emb)


def _bert_encode(params, token_ids, mask, cfg: EncoderConfig, type_ids=None):
    """BERT-family forward (post-LN residuals, learned positions).

    Matches ``transformers.BertModel`` math to f32 precision so pretrained
    bge/gte/e5-style weights (models/pretrained.py) produce the same
    embeddings on TPU that the reference got from its remote embedding
    service (``utu/rag/embeddings/service_embedder.py:16-177``)."""
    dt = cfg.dtype
    b, t = token_ids.shape
    if t > params["pos_emb"].shape[0]:
        raise ValueError(
            f"sequence length {t} exceeds the checkpoint's learned position "
            f"table ({params['pos_emb'].shape[0]}); BERT-family models cannot "
            "extrapolate positions — truncate or chunk the input"
        )
    x32 = params["tok_emb"][token_ids].astype(jnp.float32)
    x32 = x32 + params["pos_emb"][:t][None].astype(jnp.float32)
    if type_ids is None:
        x32 = x32 + params["type_emb"][0][None, None].astype(jnp.float32)
    else:
        x32 = x32 + params["type_emb"][type_ids].astype(jnp.float32)
    x = _layer_norm(
        x32, params["emb_ln_scale"], params["emb_ln_bias"], eps=cfg.ln_eps
    ).astype(dt)

    def layer(x, lp):
        a = _bert_attention(x, mask, lp, cfg)
        x = _layer_norm(x + a, lp["ln1_scale"], lp["ln1_bias"], eps=cfg.ln_eps)
        f = _ffn(x, lp, dt, approximate=cfg.gelu_approximate)
        x = _layer_norm(x + f, lp["ln2_scale"], lp["ln2_bias"], eps=cfg.ln_eps)
        return x, None

    x, _ = jax.lax.scan(layer, x, params["layers"])

    if cfg.pooling == "cls":
        pooled = x[:, 0, :].astype(jnp.float32)
        cnt = None
    else:
        summed, cnt = masked_pool_sums(x, mask)
        pooled = summed / jnp.maximum(cnt, 1.0)
    if "out_proj" in params:
        pooled = pooled @ params["out_proj"]
    emb = pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
    cls = x[:, 0, :].astype(jnp.float32)
    return emb, cls


def rerank_scores(
    params: dict,
    token_ids: jax.Array,
    mask: jax.Array,
    cfg: EncoderConfig,
    type_ids: jax.Array | None = None,
) -> jax.Array:
    """Cross-encoder relevance scores [B] from the CLS state.

    Pretrained sequence-classification rerankers (bge-reranker layout) add
    a tanh pooler before the classifier head; both are optional keys."""
    _, cls = encode_tokens(params, token_ids, mask, cfg, type_ids=type_ids)
    if "pooler_w" in params:
        cls = jnp.tanh(cls @ params["pooler_w"] + params["pooler_b"])
    s = (cls @ params["score_head"])[:, 0]
    if "score_bias" in params:
        s = s + params["score_bias"][0]
    return s
