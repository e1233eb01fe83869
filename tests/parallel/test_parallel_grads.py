"""Gradient parity through the parallelism variants.

The sp/pp/ep forwards are built from differentiable primitives
(ppermute, psum, all_to_all, scan), so training composes with them.
These tests take jax.grad of a shared scalar loss through each sharded
forward and assert the parameter gradients match the unsharded ones —
the contract that makes the shardings usable for finetuning, not just
inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from youtu_rag_tpu.models.encoder import EncoderConfig, encode_tokens, init_encoder_params
from youtu_rag_tpu.parallel.mesh import get_mesh
from youtu_rag_tpu.parallel.sequence_parallel import make_sp_encoder

CFG = EncoderConfig(
    vocab_size=256, d_model=32, n_layers=2, n_heads=4, d_ff=64, max_len=64,
    out_dim=16, dtype=jnp.float32,
)


def _loss_through(fwd):
    def loss(params, ids, mask, target):
        emb, _ = fwd(params, ids, mask)
        return jnp.sum((emb.astype(jnp.float32) - target) ** 2)

    return loss


def _batch(rng, b, t):
    ids = rng.integers(4, 256, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.float32)
    mask[:, -2:] = 0.0
    return ids, mask


@pytest.fixture(scope="module")
def params():
    return init_encoder_params(CFG, seed=0)


def _grad_close(g1, g2, atol=5e-4):
    flat1, _ = jax.tree.flatten(g1)
    flat2, _ = jax.tree.flatten(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def test_grads_through_ring_attention(params):
    rng = np.random.default_rng(0)
    ids, mask = _batch(rng, b=2, t=32)
    target = rng.normal(size=(2, CFG.out_dim)).astype(np.float32)

    mesh = get_mesh({"sp": 4})
    sp_fwd = make_sp_encoder(CFG, mesh)
    g_sp = jax.grad(_loss_through(sp_fwd))(params, ids, mask, target)

    ref_fwd = lambda p, i, m: encode_tokens(p, jnp.asarray(i), jnp.asarray(m), CFG)
    g_ref = jax.grad(_loss_through(ref_fwd))(params, ids, mask, target)
    _grad_close(g_sp, g_ref)


def test_grads_through_sp_tp(params):
    rng = np.random.default_rng(1)
    ids, mask = _batch(rng, b=2, t=16)
    target = rng.normal(size=(2, CFG.out_dim)).astype(np.float32)

    mesh = get_mesh({"sp": 2, "tp": 2})
    fwd = make_sp_encoder(CFG, mesh, tp_axis="tp")
    g = jax.grad(_loss_through(fwd))(params, ids, mask, target)

    ref_fwd = lambda p, i, m: encode_tokens(p, jnp.asarray(i), jnp.asarray(m), CFG)
    g_ref = jax.grad(_loss_through(ref_fwd))(params, ids, mask, target)
    _grad_close(g, g_ref)


def test_grads_through_expert_parallel():
    from youtu_rag_tpu.parallel.expert_parallel import (
        init_moe_params,
        make_ep_encoder,
        moe_encode_tokens,
    )

    rng = np.random.default_rng(2)
    ids, mask = _batch(rng, b=2, t=16)
    target = rng.normal(size=(2, CFG.out_dim)).astype(np.float32)
    moe_params = init_moe_params(CFG, n_experts=4, seed=0)

    mesh = get_mesh({"ep": 4})
    fwd = make_ep_encoder(CFG, mesh, n_experts=4)
    g = jax.grad(_loss_through(fwd))(moe_params, ids, mask, target)

    ref_fwd = lambda p, i, m: moe_encode_tokens(p, jnp.asarray(i), jnp.asarray(m), CFG, 4)
    g_ref = jax.grad(_loss_through(ref_fwd))(moe_params, ids, mask, target)
    _grad_close(g, g_ref)
