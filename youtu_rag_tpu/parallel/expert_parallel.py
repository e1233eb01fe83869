"""Expert-parallel MoE encoder: FFN experts sharded over an ``ep`` axis.

Completes the parallelism alphabet (dp / tp / sp / pp / ep) for the
encoder trunk. The FFN of each layer becomes a top-1-routed mixture of
experts: a router picks one expert per token, and the expert FFNs shard
over the ``ep`` mesh axis so each chip stores — and computes — only its
local experts. Capacity therefore scales with the mesh (E experts cost
each chip E/ep of a dense FFN's weights), the classic MoE scaling story.

Dispatch strategy (TPU-first): each chip evaluates its LOCAL experts
over all tokens, masks by the router's top-1 choice and probability,
and one ``psum`` combines chip contributions. Compared to
all-to-all token dispatch this trades perfectly uniform MXU matmuls and
zero layout churn for computing masked tokens; at E == ep chips it
matches a dense FFN's per-chip FLOPs exactly while holding E-fold
parameters. (An a2a dispatch drops the masked compute and is the
follow-on optimization; the psum-combine here is the correctness
anchor.) Routing is deterministic argmax — the sharded and unsharded
paths agree exactly, and tests assert it.

Training hook: ``load_balancing_loss`` is the standard switch-style
aux loss (mean fraction-routed x mean router prob, scaled by E).

No reference counterpart (SURVEY §2: the reference runs no models).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.encoder import (
    EncoderConfig,
    _attention,
    _layer_norm,
    masked_pool_sums,
    pool_project,
)

shard_map = jax.shard_map


def init_moe_params(cfg: EncoderConfig, n_experts: int, seed: int = 0) -> dict:
    """Encoder params with the FFN replaced by ``n_experts`` experts per
    layer (+ a router). Non-FFN weights reuse ``init_encoder_params``."""
    from ..models.encoder import init_encoder_params

    base = init_encoder_params(cfg, seed)
    k = jax.random.PRNGKey(seed + 1)
    ks = jax.random.split(k, 3)
    L, D, F, E = cfg.n_layers, cfg.d_model, cfg.d_ff, n_experts
    s_attn = 1.0 / np.sqrt(D)
    s_ff = 1.0 / np.sqrt(F)
    layers = dict(base["layers"])
    for gone in ("w1", "b1", "w2", "b2"):
        layers.pop(gone)
    layers.update(
        {
            "router": (jax.random.normal(ks[0], (L, D, E), jnp.float32) * 0.02),
            "ew1": (jax.random.normal(ks[1], (L, E, D, F), jnp.float32) * s_attn),
            "eb1": jnp.zeros((L, E, F), jnp.float32),
            "ew2": (jax.random.normal(ks[2], (L, E, F, D), jnp.float32) * s_ff),
            "eb2": jnp.zeros((L, E, D), jnp.float32),
        }
    )
    base["layers"] = layers
    return base


def _route(x, router_w):
    """Top-1 routing. Returns (expert_idx [B, T], prob [B, T], probs_full)."""
    logits = jnp.einsum("btd,de->bte", x.astype(jnp.float32), router_w)
    probs = jax.nn.softmax(logits, axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    p = jnp.take_along_axis(probs, idx[..., None], axis=-1)[..., 0]
    return idx.astype(jnp.int32), p, probs


def _expert_ffn(x, idx, p, lp, e_base, n_local: int, dt):
    """Evaluate ``n_local`` experts (global ids e_base..e_base+n_local)
    over all tokens, masked by the routing choice; sum of contributions.
    Inside shard_map this is the chip-local part of the psum combine."""

    def one(e_local, acc):
        w1 = jax.lax.dynamic_index_in_dim(lp["ew1"], e_local, keepdims=False)
        b1 = jax.lax.dynamic_index_in_dim(lp["eb1"], e_local, keepdims=False)
        w2 = jax.lax.dynamic_index_in_dim(lp["ew2"], e_local, keepdims=False)
        b2 = jax.lax.dynamic_index_in_dim(lp["eb2"], e_local, keepdims=False)
        h = jnp.einsum("btd,df->btf", x, w1.astype(dt)) + b1.astype(dt)
        h = jax.nn.gelu(h)
        y = jnp.einsum("btf,fd->btd", h, w2.astype(dt)) + b2.astype(dt)
        sel = (idx == (e_base + e_local)).astype(dt) * p.astype(dt)
        return acc + y * sel[..., None]

    acc = jnp.zeros_like(x)
    return jax.lax.fori_loop(0, n_local, lambda i, a: one(i, a), acc)


def moe_encode_tokens(params, token_ids, mask, cfg: EncoderConfig, n_experts: int):
    """Unsharded reference forward for the MoE encoder (parity anchor +
    CPU/single-chip path). Same contract as ``encode_tokens``."""
    dt = cfg.dtype
    x = params["tok_emb"].astype(dt)[token_ids]

    def layer(x, lp):
        h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        x = x + _attention(h, mask, lp["wq"], lp["wk"], lp["wv"], lp["wo"], cfg)
        h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        idx, p, _ = _route(h, lp["router"])
        y = _expert_ffn(h, idx, p, lp, 0, n_experts, dt)
        return x + y, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    x = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"])
    emb = pool_project(params, *masked_pool_sums(x, mask))
    return emb, x[:, 0, :].astype(jnp.float32)


def make_ep_encoder(cfg: EncoderConfig, mesh: Mesh, n_experts: int, ep_axis: str = "ep"):
    """Build the jitted expert-parallel forward (see module docstring)."""
    ep = int(mesh.shape[ep_axis])
    assert n_experts % ep == 0, (n_experts, ep)
    n_local = n_experts // ep
    dt = cfg.dtype

    def forward(params, ids, mask):
        shard = jax.lax.axis_index(ep_axis)
        e_base = shard * n_local
        x = params["tok_emb"].astype(dt)[ids]

        def layer(x, lp):
            h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
            x = x + _attention(h, mask, lp["wq"], lp["wk"], lp["wv"], lp["wo"], cfg)
            h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
            # router weights are replicated → identical routing everywhere
            idx, p, _ = _route(h, lp["router"])
            y_local = _expert_ffn(h, idx, p, lp, e_base, n_local, dt)
            y = jax.lax.psum(y_local, ep_axis)  # combine expert contributions
            return x + y, None

        x, _ = jax.lax.scan(layer, x, params["layers"])
        x = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"])
        emb = pool_project(params, *masked_pool_sums(x, mask))
        return emb, x[:, 0, :].astype(jnp.float32)

    fn = shard_map(
        forward,
        mesh=mesh,
        in_specs=(_ep_param_specs(ep_axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


_EXPERT_LEAVES = frozenset({"ew1", "eb1", "ew2", "eb2"})


def _ep_param_specs(ep_axis: str) -> dict:
    """shard_map in_specs for the MoE param tree: expert stacks shard
    dim 1 (the expert axis; dim 0 is layers), everything else
    replicated."""
    layer_specs = {
        k: P(None, ep_axis) if k in _EXPERT_LEAVES else P()
        for k in (
            "ln1_scale", "ln1_bias", "wq", "wk", "wv", "wo",
            "ln2_scale", "ln2_bias", "router", "ew1", "eb1", "ew2", "eb2",
        )
    }
    return {
        "tok_emb": P(),
        "layers": layer_specs,
        "final_ln_scale": P(),
        "final_ln_bias": P(),
        "out_proj": P(),
        "score_head": P(),
    }


def make_ep_encoder_a2a(
    cfg: EncoderConfig,
    mesh: Mesh,
    n_experts: int,
    ep_axis: str = "ep",
    capacity_factor: float = 2.0,
):
    """Expert parallelism with **all-to-all token dispatch** (Switch /
    Mesh-TensorFlow style) — the scaling form of ``make_ep_encoder``.

    Tokens shard over ``ep`` alongside the experts (the batch dimension
    is data-parallel on the same axis). Each chip routes its local
    tokens: a one-hot dispatch tensor scatters them into per-destination
    capacity slots, one ``all_to_all`` moves ~N·capacity_factor/ep
    activations per chip over ICI, the receiving chip runs only its
    local experts over what arrived, and a second ``all_to_all`` +
    combine einsum returns outputs to their source rows. Per-chip FFN
    compute is ~ep× lower than the psum-combine variant (which
    evaluates local experts over ALL tokens).

    ``capacity_factor`` bounds per-(source→destination) traffic at
    ``ceil(local_tokens / ep · cf)``; tokens past a destination's
    capacity are dropped for that layer (their FFN delta is zero — the
    residual stream carries them), the standard MoE overflow semantics.
    With balanced routing and cf ≥ 1 drops are rare; parity tests use a
    cf that guarantees droplessness and match ``moe_encode_tokens``
    exactly. Requires the global batch divisible by the ``ep`` size."""
    ep = int(mesh.shape[ep_axis])
    assert n_experts % ep == 0, (n_experts, ep)
    n_local = n_experts // ep
    dt = cfg.dtype

    def forward(params, ids, mask):
        # routing is by GLOBAL expert id; the chip offset is implicit in
        # the all_to_all destination (dest = id // n_local)
        bl, t = ids.shape  # local batch slice
        n_tok = bl * t
        cap = max(int(np.ceil(n_tok / ep * capacity_factor)), 1)
        x = params["tok_emb"].astype(dt)[ids]

        def moe_ffn(h, lp):
            hf = h.reshape(n_tok, cfg.d_model)
            idx, p, _ = _route(h, lp["router"])
            idx_f = idx.reshape(n_tok)
            p_f = p.reshape(n_tok).astype(jnp.float32)
            dest = idx_f // n_local  # [N] destination chip
            eid = (idx_f % n_local).astype(jnp.float32)

            oh = jax.nn.one_hot(dest, ep, dtype=jnp.float32)  # [N, ep]
            slot = (jnp.cumsum(oh, axis=0) * oh).sum(axis=1) - 1.0  # rank in dest
            keep = slot < cap
            slot_oh = jax.nn.one_hot(
                jnp.clip(slot, 0, cap - 1).astype(jnp.int32), cap, dtype=jnp.float32
            )
            # dispatch tensor [N, ep, cap]: one-hot (dest, slot) per kept token
            disp = oh[:, :, None] * slot_oh[:, None, :] * keep[:, None, None]

            send_x = jnp.einsum("nec,nd->ecd", disp, hf.astype(jnp.float32))
            send_e = jnp.einsum("nec,n->ec", disp, eid)
            recv_x = jax.lax.all_to_all(send_x, ep_axis, 0, 0, tiled=True)
            recv_e = jax.lax.all_to_all(send_e, ep_axis, 0, 0, tiled=True)

            xin = recv_x.reshape(ep * cap, cfg.d_model).astype(dt)
            eids = jnp.round(recv_e.reshape(ep * cap)).astype(jnp.int32)

            def one(e_local, acc):
                w1 = jax.lax.dynamic_index_in_dim(lp["ew1"], e_local, keepdims=False)
                b1 = jax.lax.dynamic_index_in_dim(lp["eb1"], e_local, keepdims=False)
                w2 = jax.lax.dynamic_index_in_dim(lp["ew2"], e_local, keepdims=False)
                b2 = jax.lax.dynamic_index_in_dim(lp["eb2"], e_local, keepdims=False)
                hh = jnp.einsum("nd,df->nf", xin, w1.astype(dt)) + b1.astype(dt)
                hh = jax.nn.gelu(hh)
                yy = jnp.einsum("nf,fd->nd", hh, w2.astype(dt)) + b2.astype(dt)
                sel = (eids == e_local).astype(dt)
                return acc + yy * sel[:, None]

            y = jax.lax.fori_loop(0, n_local, one, jnp.zeros_like(xin))
            y_back = jax.lax.all_to_all(
                y.reshape(ep, cap, cfg.d_model).astype(jnp.float32), ep_axis, 0, 0, tiled=True
            )
            out = jnp.einsum("nec,ecd->nd", disp, y_back)  # gather own rows
            out = out * p_f[:, None]  # router-probability weighting
            return out.reshape(bl, t, cfg.d_model).astype(dt)

        def layer(x, lp):
            h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
            x = x + _attention(h, mask, lp["wq"], lp["wk"], lp["wv"], lp["wo"], cfg)
            h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
            return x + moe_ffn(h, lp), None

        x, _ = jax.lax.scan(layer, x, params["layers"])
        x = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"])
        emb = pool_project(params, *masked_pool_sums(x, mask))
        return emb, x[:, 0, :].astype(jnp.float32)

    param_specs = _ep_param_specs(ep_axis)
    tok_spec = P(ep_axis, None)
    fn = shard_map(
        forward,
        mesh=mesh,
        in_specs=(param_specs, tok_spec, tok_spec),
        out_specs=(tok_spec, tok_spec),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_params_ep(params: dict, mesh: Mesh, ep_axis: str = "ep") -> dict:
    """Place a MoE param tree: expert stacks sharded over ``ep_axis`` on
    the expert dim, everything else replicated."""
    out = dict(params)
    layers = {}
    for k, v in params["layers"].items():
        if k in _EXPERT_LEAVES:
            spec = P(*([None, ep_axis] + [None] * (v.ndim - 2)))
        else:
            spec = P()
        layers[k] = jax.device_put(v, NamedSharding(mesh, spec))
    out["layers"] = layers
    for k, v in params.items():
        if k != "layers":
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
    return out


def load_balancing_loss(probs: jax.Array, idx: jax.Array, n_experts: int) -> jax.Array:
    """Switch-transformer aux loss: E * Σ_e (fraction routed to e) x
    (mean router prob of e). Minimized at uniform routing."""
    onehot = jax.nn.one_hot(idx, n_experts, dtype=jnp.float32)
    frac = jnp.mean(onehot.reshape(-1, n_experts), axis=0)
    mean_p = jnp.mean(probs.reshape(-1, n_experts), axis=0)
    return n_experts * jnp.sum(frac * mean_p)
