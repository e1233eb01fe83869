"""Causal-LM training: masked next-token cross-entropy for the decoder.

Completes the training matrix next to models/train.py (contrastive encoder
training): the reference never trains anything (all models are remote
services, ``utu/rag/embeddings/service_embedder.py:16-177``); the TPU build
owns its decoder (models/decoder.py), so it owns the fine-tune loop that
teaches it the agent loop (data: models/lm_synth.py).

TPU-first structure mirrors the encoder trainer:
- one jitted ``train_step``; batch = {tokens [B,T], attn mask [B,T],
  loss_mask [B,T]} with STATIC shapes (samples packed/padded host-side);
- loss only on completion tokens (loss_mask) — prompts are conditioning,
  not targets;
- sharded variant over a ('dp','tp') mesh using
  ``decoder.decoder_sharding_spec`` (Megatron TP) with batch on 'dp';
  XLA inserts the collectives;
- optax adamw + cosine schedule, global-norm clip, f32 master weights
  (serving casts to bf16 via ``cast_params_for_serving``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from .decoder import DecoderConfig, causal_logits, decoder_sharding_spec


@dataclass(frozen=True)
class LMTrainConfig:
    learning_rate: float = 3e-4
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 3000
    label_smoothing: float = 0.0
    remat: bool = True


def make_lm_optimizer(tc: LMTrainConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, tc.learning_rate, tc.warmup_steps, tc.total_steps
    )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=tc.weight_decay),
    )


def lm_loss(params, batch, cfg: DecoderConfig, tc: LMTrainConfig):
    """Masked next-token CE. ``batch['loss_mask']`` marks COMPLETION tokens
    (the labels we train on); positions whose *label* is a completion token
    contribute, so the prompt conditions but is not predicted."""
    logits = causal_logits(
        params, batch["tokens"], batch["mask"], cfg, remat=tc.remat
    )
    labels = batch["tokens"][:, 1:]
    lmask = batch["loss_mask"][:, 1:].astype(jnp.float32)
    lg = logits[:, :-1]
    if tc.label_smoothing > 0.0:
        n = lg.shape[-1]
        soft = optax.smooth_labels(jax.nn.one_hot(labels, n), tc.label_smoothing)
        ce = optax.softmax_cross_entropy(lg, soft)
    else:
        ce = optax.softmax_cross_entropy_with_integer_labels(lg, labels)
    denom = jnp.maximum(lmask.sum(), 1.0)
    return (ce * lmask).sum() / denom


def make_lm_train_step(cfg: DecoderConfig, tc: LMTrainConfig, optimizer):
    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(lm_loss)(params, batch, cfg, tc)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return train_step


def make_sharded_lm_train_step(
    cfg: DecoderConfig, tc: LMTrainConfig, optimizer, mesh: Mesh, params: dict
):
    """(dp,tp)-sharded step: params Megatron-sharded, batch on 'dp'.

    Returns (train_step, place_params, place_batch). Optimizer state
    inherits the param shardings (optax trees mirror the param tree)."""
    spec = decoder_sharding_spec(cfg)

    def divides(v, s):
        for dim, name in zip(v.shape, s):
            if name == "tp" and dim % mesh.shape["tp"] != 0:
                return False
        return True

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_s = treedef.flatten_up_to(spec)
    flat_s = [
        s if divides(v, s) else P(*([None] * v.ndim))
        for v, s in zip(flat_p, flat_s)
    ]
    spec = jax.tree_util.tree_unflatten(treedef, flat_s)

    def place_params(p):
        return jax.tree.map(
            lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), p, spec
        )

    bspec = P("dp", None)

    def place_batch(batch):
        return {
            k: jax.device_put(v, NamedSharding(mesh, bspec)) for k, v in batch.items()
        }

    @jax.jit
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(lm_loss)(params, batch, cfg, tc)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    return train_step, place_params, place_batch


# ------------------------------------------------------------- host batching


def encode_samples(
    samples: list[tuple[str, str]],
    tokenizer,
    max_len: int,
    eos_id: int,
) -> list[tuple[np.ndarray, int]]:
    """(prompt, completion) → (token ids incl. trailing eos, prompt_len).
    Samples longer than ``max_len`` drop the FRONT of the prompt (the
    system block repeats across samples; the tail holds the question)."""
    out = []
    for prompt, completion in samples:
        p = tokenizer.encode(prompt)
        c = tokenizer.encode(completion) + [eos_id]
        if len(p) + len(c) > max_len:
            p = p[-(max_len - len(c)):]
        out.append((np.asarray(p + c, np.int32), len(p)))
    return out


def pack_batch(
    encoded: list[tuple[np.ndarray, int]], max_len: int, pad_id: int
) -> dict[str, np.ndarray]:
    """Right-pad to [B, max_len] with attention + completion loss masks."""
    b = len(encoded)
    tokens = np.full((b, max_len), pad_id, np.int32)
    mask = np.zeros((b, max_len), np.float32)
    loss_mask = np.zeros((b, max_len), np.float32)
    for i, (ids, p_len) in enumerate(encoded):
        n = min(len(ids), max_len)
        tokens[i, :n] = ids[:n]
        mask[i, :n] = 1.0
        loss_mask[i, p_len:n] = 1.0
    return {"tokens": tokens, "mask": mask, "loss_mask": loss_mask}
