"""Pipeline-parallel encoder: GPipe-style microbatch pipeline over a
``pp`` mesh axis.

The encoder's layers are already stacked on a leading axis and scanned
(``models/encoder.py``), so pipeline parallelism is a resharding of that
axis: stage ``s`` holds layers ``[s*L/S, (s+1)*L/S)`` (params sharded on
the layer axis over 'pp' — each chip stores 1/S of the trunk, the reason
to use PP at all), and microbatches flow stage→stage via ``ppermute``.

Schedule: the classic GPipe fill-drain loop. With M microbatches and S
stages the shard_map body runs ``M + S - 1`` ticks; at tick ``t`` stage
``s`` processes microbatch ``t - s`` (when in range). Each tick is one
``lax.scan`` over the stage's local layers, then one ``ppermute`` hop of
the activation to the next stage — compute and the ICI hop overlap, and
the pipeline bubble is the standard ``(S-1)/(M+S-1)`` fraction.

Embedding lookup and final layernorm/pooling run outside the pipeline
(replicated — they are a tiny fraction of the FLOPs); the pipeline body
moves only [mb, T, D] activations, never weights.

No reference counterpart (the reference runs no transformer); parity
with the unsharded forward is asserted in tests and the driver dryrun.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.encoder import (
    EncoderConfig,
    _attention,
    _ffn,
    _layer_norm,
    masked_pool_sums,
    pool_project,
)

shard_map = jax.shard_map


def _stage_forward(x, layers, mask, cfg: EncoderConfig):
    """Scan this stage's local layer slice over activation x [mb, T, D]."""
    dt = cfg.dtype

    def layer(x, lp):
        h = _layer_norm(x, lp["ln1_scale"], lp["ln1_bias"])
        x = x + _attention(h, mask, lp["wq"], lp["wk"], lp["wv"], lp["wo"], cfg)
        h = _layer_norm(x, lp["ln2_scale"], lp["ln2_bias"])
        return x + _ffn(h, lp, dt), None

    out, _ = jax.lax.scan(layer, x, layers)
    return out


def make_pp_encoder(cfg: EncoderConfig, mesh: Mesh, pp_axis: str = "pp", n_micro: int | None = None):
    """Build the jitted pipeline forward.

    Returns ``fn(params, token_ids, mask) -> (emb, cls)`` matching
    ``encode_tokens``. The batch must divide ``n_micro`` (default: the
    stage count). Layer params are sharded over ``pp_axis`` — place them
    with ``shard_params_pp`` so each stage materializes only its slice."""
    S = int(mesh.shape[pp_axis])
    assert cfg.n_layers % S == 0, (cfg.n_layers, S)
    M = n_micro or S

    def pipeline(layers, x, mask):
        # layers: local slice [L/S, ...]; x: [M, mb, T, D] (replicated);
        # mask: [M, mb, T]
        stage = jax.lax.axis_index(pp_axis)
        mb, t, d = x.shape[1], x.shape[2], x.shape[3]
        perm = [(i, (i + 1) % S) for i in range(S)]
        n_ticks = M + S - 1

        def tick(carry, tk):
            state, out = carry
            # stage 0 ingests microbatch tk (when in range); others take
            # the activation handed over from stage-1 last tick
            mb_in_idx = jnp.clip(tk, 0, M - 1)
            fresh = jax.lax.dynamic_index_in_dim(x, mb_in_idx, keepdims=False)
            x_in = jnp.where(stage == 0, fresh, state)
            # every stage processes the microbatch it currently holds
            my_mb = jnp.clip(tk - stage, 0, M - 1)
            m_in = jax.lax.dynamic_index_in_dim(mask, my_mb, keepdims=False)
            y = _stage_forward(x_in, layers, m_in, cfg)
            # last stage banks its finished microbatch (valid ticks only)
            valid = (tk - stage >= 0) & (tk - stage < M) & (stage == S - 1)
            out = jax.lax.cond(
                valid,
                lambda o: jax.lax.dynamic_update_index_in_dim(o, y, my_mb, 0),
                lambda o: o,
                out,
            )
            state = jax.lax.ppermute(y, pp_axis, perm)
            return (state, out), None

        state0 = jnp.zeros((mb, t, d), x.dtype)
        out0 = jnp.zeros((M, mb, t, d), x.dtype)
        (_, out), _ = jax.lax.scan(tick, (state0, out0), jnp.arange(n_ticks))
        # only the last stage holds real outputs; psum broadcasts them
        # (all other stages contribute zeros)
        out = jnp.where(stage == S - 1, out, 0.0)
        return jax.lax.psum(out, pp_axis)

    piped = shard_map(
        pipeline,
        mesh=mesh,
        in_specs=(P(pp_axis), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def fn(params, token_ids, mask):
        b, t = token_ids.shape
        assert b % M == 0, f"batch {b} must divide into {M} microbatches"
        mb = b // M
        dt = cfg.dtype
        x = params["tok_emb"].astype(dt)[token_ids]  # [B, T, D]
        xm = x.reshape(M, mb, t, cfg.d_model)
        mm = mask.reshape(M, mb, t)
        y = piped(params["layers"], xm, mm).reshape(b, t, cfg.d_model)
        y = _layer_norm(y, params["final_ln_scale"], params["final_ln_bias"])
        emb = pool_project(params, *masked_pool_sums(y, mask))
        cls = y[:, 0, :].astype(jnp.float32)
        return emb, cls

    return jax.jit(fn)


def shard_params_pp(params: dict, mesh: Mesh, pp_axis: str = "pp") -> dict:
    """Place the param tree for the pipeline: layer stacks sharded on the
    layer axis over ``pp_axis``; everything else replicated."""

    def place(path_is_layer: bool, leaf):
        if path_is_layer:
            spec = P(*([pp_axis] + [None] * (leaf.ndim - 1)))
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    out = dict(params)
    out["layers"] = {k: place(True, v) for k, v in params["layers"].items()}
    for k, v in params.items():
        if k != "layers":
            out[k] = place(False, v)
    return out
