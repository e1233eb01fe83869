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
parameters. (``make_ep_encoder_a2a`` is the scaling form: all-to-all
token dispatch + per-expert block matmuls drop the masked compute; the
psum-combine here is the correctness anchor.) Routing is deterministic
argmax — the sharded and unsharded paths agree exactly, and tests
assert it.

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


def moe_encode_tokens_with_aux(params, token_ids, mask, cfg: EncoderConfig, n_experts: int):
    """``moe_encode_tokens`` + the Switch load-balancing aux loss averaged
    over layers (the training forward). Top-1 argmax routing passes no
    gradient to unselected experts, so balance is learned *only* through
    this term — it must ride the loss, not a metric (models/train.py
    wires it with ``MoETrainConfig.aux_loss_weight``).

    Returns (emb [B, E], cls [B, D], aux_loss scalar fp32).
    """
    dt = cfg.dtype
    x = params["tok_emb"].astype(dt)[token_ids]

    def layer(carry, lp):
        x, aux = carry
        h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        x = x + _attention(h, mask, lp["wq"], lp["wk"], lp["wv"], lp["wo"], cfg)
        h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        idx, p, probs = _route(h, lp["router"])
        aux = aux + load_balancing_loss(probs, idx, n_experts)
        y = _expert_ffn(h, idx, p, lp, 0, n_experts, dt)
        return (x + y, aux), None

    (x, aux), _ = jax.lax.scan(layer, (x, jnp.zeros((), jnp.float32)), params["layers"])
    x = _layer_norm(x, params["final_ln_scale"], params["final_ln_bias"])
    emb = pool_project(params, *masked_pool_sums(x, mask))
    return emb, x[:, 0, :].astype(jnp.float32), aux / cfg.n_layers


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
    expert_capacity_factor: float = 2.0,
):
    """Expert parallelism with **all-to-all token dispatch** (Switch /
    Mesh-TensorFlow style) — the scaling form of ``make_ep_encoder``.

    Tokens shard over ``ep`` alongside the experts (the batch dimension
    is data-parallel on the same axis). Each chip routes its local
    tokens into per-destination capacity slots via a **scatter** (no
    [N, ep, cap] one-hot matmul — dispatch costs O(N·D) data movement),
    one ``all_to_all`` moves ~N·capacity_factor/ep activations per chip
    over ICI, and the receiving chip packs arrivals into per-expert
    blocks ``[n_local, cap_e, D]`` so the whole local FFN is **one
    batched MXU matmul per weight** (``ecd,edf->ecf``) — per-chip FFN
    FLOPs scale with tokens actually routed, ~ep× below the
    psum-combine variant which evaluates local experts over ALL tokens.
    A second ``all_to_all`` + gather returns outputs to source rows.

    ``capacity_factor`` bounds per-(source→destination) traffic at
    ``ceil(local_tokens / ep · cf)``; ``expert_capacity_factor`` bounds
    each local expert's block at ``ceil(arrivals / n_local · ecf)``.
    Tokens past either capacity are dropped for that layer (their FFN
    delta is zero — the residual stream carries them), the standard MoE
    overflow semantics. With balanced routing and factors ≥ 1 drops are
    rare; parity tests use factors that guarantee droplessness and match
    ``moe_encode_tokens`` exactly. Requires the global batch divisible
    by the ``ep`` size."""
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
        n_arr = ep * cap  # arrival buffer rows per chip
        cap_e = min(n_arr, max(int(np.ceil(n_arr / n_local * expert_capacity_factor)), 1))
        x = params["tok_emb"].astype(dt)[ids]

        def moe_ffn(h, lp):
            hf = h.reshape(n_tok, cfg.d_model).astype(jnp.float32)
            idx, p, _ = _route(h, lp["router"])
            idx_f = idx.reshape(n_tok)
            p_f = p.reshape(n_tok).astype(jnp.float32)
            dest = idx_f // n_local  # [N] destination chip
            eid = (idx_f % n_local).astype(jnp.float32)

            # hop 1 (scatter): rank within destination → capacity slot
            oh = jax.nn.one_hot(dest, ep, dtype=jnp.float32)  # [N, ep]
            slot = (jnp.cumsum(oh, axis=0) * oh).sum(axis=1) - 1.0
            keep = slot < cap
            slot_c = jnp.clip(slot, 0, cap - 1).astype(jnp.int32)
            kf = keep.astype(jnp.float32)
            send_x = jnp.zeros((ep, cap, cfg.d_model), jnp.float32).at[
                dest, slot_c
            ].add(hf * kf[:, None])
            # pack eid+1 so 0 marks an empty slot after the exchange
            send_e = jnp.zeros((ep, cap), jnp.float32).at[dest, slot_c].add(
                (eid + 1.0) * kf
            )
            recv_x = jax.lax.all_to_all(send_x, ep_axis, 0, 0, tiled=True)
            recv_e = jax.lax.all_to_all(send_e, ep_axis, 0, 0, tiled=True)

            xin = recv_x.reshape(n_arr, cfg.d_model)
            e_in = jnp.round(recv_e.reshape(n_arr))
            valid = e_in >= 0.5
            eids = jnp.clip(e_in - 1.0, 0, n_local - 1).astype(jnp.int32)

            # hop 2 (local scatter): arrivals → per-expert blocks
            oh_e = jax.nn.one_hot(eids, n_local, dtype=jnp.float32)
            oh_e = oh_e * valid[:, None].astype(jnp.float32)
            slot_e = (jnp.cumsum(oh_e, axis=0) * oh_e).sum(axis=1) - 1.0
            keep_e = valid & (slot_e >= 0) & (slot_e < cap_e)
            slot_ec = jnp.clip(slot_e, 0, cap_e - 1).astype(jnp.int32)
            kef = keep_e.astype(jnp.float32)
            xbuf = jnp.zeros((n_local, cap_e, cfg.d_model), jnp.float32).at[
                eids, slot_ec
            ].add(xin * kef[:, None])

            # one batched matmul over all local expert blocks (MXU form)
            hh = jnp.einsum(
                "ecd,edf->ecf", xbuf.astype(dt), lp["ew1"].astype(dt)
            ) + lp["eb1"][:, None, :].astype(dt)
            hh = jax.nn.gelu(hh)
            y_e = jnp.einsum(
                "ecf,efd->ecd", hh, lp["ew2"].astype(dt)
            ) + lp["eb2"][:, None, :].astype(dt)

            # gather back along both hops (junk rows zeroed by the masks)
            y_tok = y_e.astype(jnp.float32)[eids, slot_ec] * kef[:, None]
            y_back = jax.lax.all_to_all(
                y_tok.reshape(ep, cap, cfg.d_model), ep_axis, 0, 0, tiled=True
            )
            out = y_back[dest, slot_c] * kf[:, None]
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
