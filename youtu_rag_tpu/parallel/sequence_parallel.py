"""Sequence-parallel encoder: ring attention over the ICI mesh.

The attach point SURVEY.md §5.7 names: very long inputs (whole-document
embedding, HiChunk-scale markdown) outgrow one chip's memory/latency at
T ≫ 8k even with the flash kernel. Here the *sequence* axis shards over
the mesh — each chip holds a [B, T/S] slice of the tokens — and
attention runs as **ring attention**: queries stay local while K/V (and
the padding-mask bias) blocks rotate around the ring via
``jax.lax.ppermute``, with online-softmax accumulation in f32, so the
full [T, T] score matrix never exists on any chip and peak activation
memory drops by the ring size. Everything else in the transformer
(layernorm, FFN, residuals) is per-token and needs no communication;
mean-pooling finishes with one ``psum`` over the ring.

Design notes (TPU-first):
- bidirectional encoder → no causal masking; every ring step does the
  same dense [Tl x Tl] block matmul on the MXU — uniform, compiler
  friendly, and overlappable (ppermute of the next block rides ICI
  while the current block multiplies);
- RoPE uses each shard's global position offset so results match the
  unsharded forward bit-for-bit in f32 (tests assert parity);
- composes with dp (batch) sharding on an outer mesh axis: the ring
  collectives only touch the ``sp`` axis.

No reference counterpart (SURVEY §5.7: the reference never runs a
transformer); the design follows the public ring-attention recipe
(Liu et al. 2023) expressed as shard_map + ppermute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.encoder import (
    EncoderConfig,
    _ffn,
    _layer_norm,
    _rope,
    masked_pool_sums,
    pool_project,
)

shard_map = jax.shard_map


def _ring_attention(
    q, k, v, bias, axis: str, sp_size: int, scale: float, impl: str = "xla"
):
    """Full (non-causal) ring attention.

    Args:
      q, k, v: [B, H, Tl, hd] local blocks (RoPE already applied).
      bias:    [B, Tl] additive mask bias for the LOCAL key block
               (0 live, -1e9 padding); travels the ring with k/v.
      impl:    "xla" materializes the per-hop [Tl, Tl] score block;
               "pallas"/"flash" run the flash kernel inside each hop
               (``ops.attention.flash_attention_stats``), so even long
               local blocks (the exact case SP exists for) never hold a
               score matrix — the hop emits (acc, m, l) and hops merge
               with the same online-softmax recurrence the kernel uses
               internally. "pallas_interpret" = flash in interpret mode.
    Returns: [B, H, Tl, hd] attention output (q's dtype).
    """
    b, h, tl, hd = q.shape
    perm = [(i, (i + 1) % sp_size) for i in range(sp_size)]
    use_flash = (
        impl in ("pallas", "flash", "pallas_interpret")
        and tl >= 256 and tl % 128 == 0 and hd % 64 == 0
    )

    if use_flash:
        from ..ops.attention import flash_attention_stats

        interpret = impl == "pallas_interpret"

        def step(carry, _):
            k_cur, v_cur, b_cur, m, l, acc = carry
            # kernel scale is 1/sqrt(hd) — identical to `scale` by
            # construction; the bias rides the ring as [B, Tl]
            acc_h, m_h, l_h = flash_attention_stats(
                q, k_cur, v_cur, b_cur, interpret=interpret
            )
            m_new = jnp.maximum(m, m_h)
            a_old = jnp.exp(m - m_new)
            a_hop = jnp.exp(m_h - m_new)
            l = l * a_old + l_h * a_hop
            acc = acc * a_old[..., None] + acc_h * a_hop[..., None]
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            b_nxt = jax.lax.ppermute(b_cur, axis, perm)
            return (k_nxt, v_nxt, b_nxt, m_new, l, acc), None

        # -1e30, not -inf: the cross-hop combine computes exp(m − m_new)
        # and exp(-inf − -inf) is NaN (matches the kernel's own init)
        m0 = jnp.full((b, h, tl), -1e30, jnp.float32)
    else:
        qf = q.astype(jnp.float32)

        def step(carry, _):
            k_cur, v_cur, b_cur, m, l, acc = carry
            s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32)) * scale
            s = s + b_cur[:, None, None, :]  # [B, 1, 1, Tl] padding bias
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))  # [B, H, Tl]
            p = jnp.exp(s - m_new[..., None])  # [B, H, Tl, Tl]
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1)
            acc = acc * corr[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32)
            )
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            b_nxt = jax.lax.ppermute(b_cur, axis, perm)
            return (k_nxt, v_nxt, b_nxt, m_new, l, acc), None

        m0 = jnp.full((b, h, tl), -jnp.inf, jnp.float32)

    l0 = jnp.zeros((b, h, tl), jnp.float32)
    acc0 = jnp.zeros((b, h, tl, hd), jnp.float32)
    (k, v, bias, m, l, acc), _ = jax.lax.scan(
        step, (k, v, bias, m0, l0, acc0), None, length=sp_size
    )
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def make_sp_encoder(
    cfg: EncoderConfig,
    mesh: Mesh,
    sp_axis: str = "sp",
    dp_axis: str | None = None,
    tp_axis: str | None = None,
):
    """Build the jitted sequence-sharded forward.

    Returns ``fn(params, token_ids, mask) -> (emb [B, out_dim] f32, cls
    [B, d_model] f32)`` with the same contract as ``encode_tokens``.
    ``token_ids``/``mask`` are [B, T] with T divisible by the sp size
    (pad to a multiple; padding has mask 0).

    With ``tp_axis`` the layer weights additionally shard Megatron-style
    over tensor parallelism — wq/wk/wv and w1 column-parallel (heads /
    FFN hidden split across chips), wo and w2 row-parallel with a psum —
    composing a full dp × sp × tp mesh: batch over dp, sequence over the
    sp ring, heads+hidden over tp. Activations stay replicated across tp
    between blocks (standard Megatron), so the ring attention is
    unchanged — it just runs on the local head subset."""
    sp_size = int(mesh.shape[sp_axis])
    tp_size = int(mesh.shape[tp_axis]) if tp_axis else 1
    dt = cfg.dtype
    assert cfg.n_heads % tp_size == 0, (cfg.n_heads, tp_size)
    assert cfg.d_ff % tp_size == 0, (cfg.d_ff, tp_size)
    h_local = cfg.n_heads // tp_size
    hd = cfg.head_dim
    scale = 1.0 / float(np.sqrt(hd))
    batch_spec = dp_axis  # None → replicated batch

    def forward(params, ids, mask):
        # ids/mask: [B, Tl] local slice
        b, tl = ids.shape
        shard = jax.lax.axis_index(sp_axis)
        pos0 = (shard * tl).astype(jnp.float32)
        x = params["tok_emb"].astype(dt)[ids]  # [B, Tl, D]
        kv_bias = (1.0 - mask.astype(jnp.float32)) * -1e9  # [B, Tl]

        def proj(xin, w):
            # w: [D, D/tp] local column slice → local heads
            y = jnp.einsum("btd,de->bte", xin, w.astype(xin.dtype))
            return y.reshape(b, tl, h_local, hd).transpose(0, 2, 1, 3)

        def layer(x, lp):
            hn = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
            q = _rope(proj(hn, lp["wq"]), cfg.rope_base, pos_offset=pos0)
            k = _rope(proj(hn, lp["wk"]), cfg.rope_base, pos_offset=pos0)
            v = proj(hn, lp["wv"])
            y = _ring_attention(
                q, k, v, kv_bias, sp_axis, sp_size, scale, impl=cfg.attention_impl
            )
            y = y.transpose(0, 2, 1, 3).reshape(b, tl, h_local * hd)
            attn_out = jnp.einsum("btd,de->bte", y, lp["wo"].astype(x.dtype))
            if tp_axis:  # row-parallel wo: partial sums combine over tp
                attn_out = jax.lax.psum(attn_out, tp_axis)
            x = x + attn_out
            hn = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
            if tp_axis:
                # column-parallel w1 (+its bias slice), row-parallel w2;
                # b2 adds AFTER the psum or it would be counted tp times
                hh = jnp.einsum("btd,df->btf", hn, lp["w1"].astype(dt)) + lp["b1"].astype(dt)
                hh = jax.nn.gelu(hh)
                ff = jax.lax.psum(
                    jnp.einsum("btf,fd->btd", hh, lp["w2"].astype(dt)), tp_axis
                ) + lp["b2"].astype(dt)
                return x + ff, None
            return x + _ffn(hn, lp, dt), None

        x, _ = jax.lax.scan(layer, x, params["layers"])
        x = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"])

        # masked mean pool: local partial sums, one psum over the ring
        summed, cnt = masked_pool_sums(x, mask)
        emb = pool_project(
            params, jax.lax.psum(summed, sp_axis), jax.lax.psum(cnt, sp_axis)
        )
        # CLS (global position 0) lives on ring rank 0; psum broadcasts it
        cls_local = jnp.where(shard == 0, x[:, 0, :].astype(jnp.float32), 0.0)
        cls = jax.lax.psum(cls_local, sp_axis)
        return emb, cls

    seq_spec = P(batch_spec, sp_axis)
    out_spec = P(batch_spec, None) if batch_spec else P()
    if tp_axis:
        layer_specs = {
            "ln1_scale": P(), "ln1_bias": P(),
            "wq": P(None, None, tp_axis), "wk": P(None, None, tp_axis),
            "wv": P(None, None, tp_axis), "wo": P(None, tp_axis, None),
            "ln2_scale": P(), "ln2_bias": P(),
            "w1": P(None, None, tp_axis), "b1": P(None, tp_axis),
            "w2": P(None, tp_axis, None), "b2": P(),
        }
        param_specs = {
            "tok_emb": P(),
            "layers": layer_specs,
            "final_ln_scale": P(),
            "final_ln_bias": P(),
            "out_proj": P(),
            "score_head": P(),
        }
    else:
        param_specs = P()
    fn = shard_map(
        forward,
        mesh=mesh,
        in_specs=(param_specs, seq_spec, seq_spec),
        out_specs=(out_spec, out_spec),
        check_vma=False,  # psum makes outputs replicated over sp
    )
    return jax.jit(fn)


def pad_to_multiple(ids: np.ndarray, mask: np.ndarray, multiple: int):
    """Right-pad [B, T] token ids + mask so T divides the ring size."""
    b, t = ids.shape
    t_pad = ((t + multiple - 1) // multiple) * multiple
    if t_pad == t:
        return ids, mask
    out_ids = np.zeros((b, t_pad), ids.dtype)
    out_mask = np.zeros((b, t_pad), mask.dtype)
    out_ids[:, :t] = ids
    out_mask[:, :t] = mask
    return out_ids, out_mask
