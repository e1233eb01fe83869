"""Contrastive (InfoNCE) training for the embedder/reranker trunk.

The reference never trains (all models are remote services); the TPU build
owns its encoder, so it also owns the fine-tuning loop that adapts it to a
corpus. Bi-encoder InfoNCE with in-batch negatives:

    L = CE(Q @ D^T / tau, diag)  symmetrized

TPU-first structure:
- one jitted ``train_step`` over a ``('dp', 'tp')`` mesh: batch sharded on
  'dp', params Megatron-sharded on 'tp' (``encoder.param_sharding_spec``);
  XLA inserts the psum/all-gathers (in-batch negatives need the full Q/D
  gram matrix — a ['dp'-all-gather of [B/dp, E] embeddings, tiny vs the
  encoder FLOPs);
- optax adamw + cosine schedule; grads/optimizer state inherit param
  sharding (no ZeRO needed at this size — flip 'tp' to more 'dp' shards
  for bigger runs);
- ``jax.checkpoint`` on the layer scan body trades FLOPs for HBM.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .encoder import EncoderConfig, encode_tokens, init_encoder_params, param_sharding_spec


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 10_000
    temperature: float = 0.05
    remat: bool = True


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, tc.learning_rate, tc.warmup_steps, tc.total_steps
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=tc.weight_decay),
    )


def info_nce_loss(params, batch, cfg: EncoderConfig, tc: TrainConfig):
    """batch: dict with q_ids/q_mask/d_ids/d_mask, each [B, T]."""
    enc = encode_tokens
    if tc.remat:
        enc = jax.checkpoint(encode_tokens, static_argnums=(3,))
    q_emb, _ = enc(params, batch["q_ids"], batch["q_mask"], cfg)  # [B, E]
    d_emb, _ = enc(params, batch["d_ids"], batch["d_mask"], cfg)
    logits = (q_emb @ d_emb.T) / tc.temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    l_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    l_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    loss = 0.5 * (l_qd + l_dq)
    acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return loss, {"loss": loss, "accuracy": acc}


def make_train_step(cfg: EncoderConfig, tc: TrainConfig, optimizer):
    def train_step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(info_nce_loss, has_aux=True)(
            params, batch, cfg, tc
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def sharding_spec_for(params: dict, cfg: EncoderConfig, mesh: Mesh) -> dict:
    """PartitionSpec tree shaped exactly like ``params``.

    Pretrained imports (models/pretrained.py) carry optional extra keys —
    pooler_w/score_head/score_bias — beyond ``param_sharding_spec``'s
    canonical tree; those replicate. Keys the spec knows keep their
    Megatron placement unless a sharded dimension does not divide over
    the mesh (e.g. an arbitrary pretrained vocab over 'tp'), in which
    case that leaf replicates — correctness first, placement second."""
    base = param_sharding_spec(cfg)

    def divides(v, spec) -> bool:
        for i, axes in enumerate(spec):
            if axes is None:
                continue
            names = axes if isinstance(axes, tuple) else (axes,)
            size = 1
            for a in names:
                size *= int(mesh.shape[a])
            if v.shape[i] % size != 0:
                return False
        return True

    def walk(p, b):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = walk(v, b.get(k, {}) if isinstance(b, dict) else {})
            else:
                s = b.get(k) if isinstance(b, dict) else None
                if s is None or not divides(v, s):
                    s = P(*([None] * v.ndim))
                out[k] = s
        return out

    return walk(params, base)


def make_sharded_train_step(
    cfg: EncoderConfig,
    tc: TrainConfig,
    mesh: Mesh,
    seed: int = 0,
    init_params: dict | None = None,
):
    """Initialize sharded params/opt-state and a jitted dp×tp train step.

    Returns (params, opt_state, step_fn) with:
      params/opt state sharded per ``param_sharding_spec`` over 'tp',
      batch expected sharded on 'dp' (leading axis).

    ``init_params`` starts from existing weights (e.g. a pretrained
    BERT-family import) instead of random init — the fine-tune path."""
    optimizer = make_optimizer(tc)
    if init_params is not None:
        pspec = sharding_spec_for(init_params, cfg, mesh)
        param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspec)
        params = jax.tree.map(
            lambda x, sh: jax.device_put(jnp.asarray(x), sh), init_params, param_sh
        )
    else:
        pspec = param_sharding_spec(cfg)
        param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspec)
        init = jax.jit(
            lambda: init_encoder_params(cfg, seed),
            out_shardings=param_sh,
        )
        params = init()
    batch_sh = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())
    opt_state = jax.jit(optimizer.init, out_shardings=None)(params)

    step = jax.jit(
        make_train_step(cfg, tc, optimizer),
        in_shardings=(param_sh, None, {k: batch_sh for k in ("q_ids", "q_mask", "d_ids", "d_mask")}),
        out_shardings=(param_sh, None, {"loss": repl, "accuracy": repl}),
        donate_argnums=(0, 1),
    )
    return params, opt_state, step


# ------------------------------------------------------------------- MoE
#
# The MoE training recipe: same InfoNCE objective through the MoE forward,
# plus the Switch load-balancing aux loss in the objective (top-1 argmax
# routing gives unselected experts zero gradient — without the aux term
# the router collapses onto one expert and capacity is wasted). Expert
# stacks shard over an 'ep' mesh axis via GSPMD annotations; the
# shard_map a2a dispatch path (parallel/expert_parallel.py) stays the
# serving-scale forward.


@dataclass(frozen=True)
class MoETrainConfig(TrainConfig):
    n_experts: int = 8
    aux_loss_weight: float = 1e-2


def moe_info_nce_loss(params, batch, cfg: EncoderConfig, tc: MoETrainConfig):
    from ..parallel.expert_parallel import moe_encode_tokens_with_aux

    enc = moe_encode_tokens_with_aux
    if tc.remat:
        enc = jax.checkpoint(moe_encode_tokens_with_aux, static_argnums=(3, 4))
    q_emb, _, q_aux = enc(params, batch["q_ids"], batch["q_mask"], cfg, tc.n_experts)
    d_emb, _, d_aux = enc(params, batch["d_ids"], batch["d_mask"], cfg, tc.n_experts)
    logits = (q_emb @ d_emb.T) / tc.temperature
    labels = jnp.arange(logits.shape[0])
    l_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    l_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    contrastive = 0.5 * (l_qd + l_dq)
    aux = 0.5 * (q_aux + d_aux)
    loss = contrastive + tc.aux_loss_weight * aux
    acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return loss, {
        "loss": loss,
        "contrastive_loss": contrastive,
        "aux_loss": aux,
        "accuracy": acc,
    }


def make_moe_train_step(cfg: EncoderConfig, tc: MoETrainConfig, optimizer):
    def train_step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(moe_info_nce_loss, has_aux=True)(
            params, batch, cfg, tc
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


_MOE_EXPERT_LEAVES = frozenset({"ew1", "eb1", "ew2", "eb2"})


def moe_sharding_spec(params: dict, mesh: Mesh, ep_axis: str = "ep") -> dict:
    """PartitionSpec tree for an ``init_moe_params`` tree: expert stacks
    ``[L, E, …]`` shard the expert axis (dim 1) over ``ep_axis`` when E
    divides; everything else replicates (routers must be replicated so
    routing is identical everywhere)."""
    ep = int(mesh.shape[ep_axis])

    def leaf(path_key, v):
        if path_key in _MOE_EXPERT_LEAVES and v.ndim >= 2 and v.shape[1] % ep == 0:
            return P(None, ep_axis)
        return P(*([None] * v.ndim))

    def walk(p):
        out = {}
        for k, v in p.items():
            out[k] = walk(v) if isinstance(v, dict) else leaf(k, v)
        return out

    return walk(params)


def make_sharded_moe_train_step(
    cfg: EncoderConfig,
    tc: MoETrainConfig,
    mesh: Mesh,
    seed: int = 0,
    init_params: dict | None = None,
    ep_axis: str = "ep",
):
    """Sharded MoE fine-tune step over a ('dp', 'ep') mesh.

    Experts shard over 'ep', batch over 'dp'; routers and the dense trunk
    replicate. GSPMD inserts the expert gathers and gradient reductions
    from the sharding annotations alone — the idiomatic-pjit counterpart
    of ``make_sharded_train_step``. Returns (params, opt_state, step_fn).
    """
    from ..parallel.expert_parallel import init_moe_params

    optimizer = make_optimizer(tc)
    if init_params is not None:
        pspec = moe_sharding_spec(init_params, mesh, ep_axis)
        param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspec)
        params = jax.tree.map(
            lambda x, sh: jax.device_put(jnp.asarray(x), sh), init_params, param_sh
        )
    else:
        shapes = jax.eval_shape(lambda: init_moe_params(cfg, tc.n_experts, seed))
        pspec = moe_sharding_spec(shapes, mesh, ep_axis)
        param_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), pspec)
        params = jax.jit(
            lambda: init_moe_params(cfg, tc.n_experts, seed), out_shardings=param_sh
        )()
    batch_sh = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())
    opt_state = jax.jit(optimizer.init, out_shardings=None)(params)

    step = jax.jit(
        make_moe_train_step(cfg, tc, optimizer),
        in_shardings=(param_sh, None, {k: batch_sh for k in ("q_ids", "q_mask", "d_ids", "d_mask")}),
        out_shardings=(
            param_sh,
            None,
            {k: repl for k in ("loss", "contrastive_loss", "aux_loss", "accuracy")},
        ),
        donate_argnums=(0, 1),
    )
    return params, opt_state, step
