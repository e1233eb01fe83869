"""Expert-parallel MoE encoder: sharded/unsharded parity, expert
placement, routing behavior, aux loss."""

import numpy as np
import pytest

import jax.numpy as jnp

from youtu_rag_tpu.models.encoder import EncoderConfig
from youtu_rag_tpu.parallel.expert_parallel import (
    init_moe_params,
    load_balancing_loss,
    make_ep_encoder,
    make_ep_encoder_a2a,
    moe_encode_tokens,
    shard_params_ep,
    _route,
)
from youtu_rag_tpu.parallel.mesh import get_mesh

CFG = EncoderConfig(
    vocab_size=256, d_model=32, n_layers=2, n_heads=4, d_ff=64, max_len=64,
    out_dim=16, dtype=jnp.float32,
)
E = 8


@pytest.fixture(scope="module")
def params():
    return init_moe_params(CFG, n_experts=E, seed=0)


def _batch(rng, b, t):
    ids = rng.integers(4, 256, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.float32)
    mask[:, t - 3:] = 0.0
    ids[mask == 0] = 0
    return ids, mask


def test_moe_params_shape(params):
    assert params["layers"]["ew1"].shape == (CFG.n_layers, E, CFG.d_model, CFG.d_ff)
    assert "w1" not in params["layers"]


@pytest.mark.parametrize("ep", [2, 4, 8])
def test_ep_matches_unsharded(params, ep):
    rng = np.random.default_rng(ep)
    ids, mask = _batch(rng, b=3, t=24)
    mesh = get_mesh({"ep": ep})
    fn = make_ep_encoder(CFG, mesh, n_experts=E)
    emb_ep, cls_ep = fn(shard_params_ep(params, mesh), ids, mask)
    emb, cls = moe_encode_tokens(params, jnp.asarray(ids), jnp.asarray(mask), CFG, E)
    np.testing.assert_allclose(np.asarray(emb_ep), np.asarray(emb), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cls_ep), np.asarray(cls), atol=2e-4)


def test_expert_placement(params):
    mesh = get_mesh({"ep": 4})
    sharded = shard_params_ep(params, mesh)
    shard = next(iter(sharded["layers"]["ew1"].addressable_shards))
    assert shard.data.shape[1] == E // 4  # expert dim sharded
    assert sharded["layers"]["router"].is_fully_replicated


def test_routing_uses_multiple_experts(params):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, CFG.d_model)).astype(np.float32))
    idx, p, probs = _route(x, params["layers"]["router"][0])
    assert len(np.unique(np.asarray(idx))) > 1  # not a collapsed router
    assert float(p.min()) >= 1.0 / E  # top-1 prob at least uniform


@pytest.mark.parametrize("ep", [2, 4])
def test_a2a_dispatch_matches_unsharded_when_dropless(params, ep):
    """Switch-style all_to_all dispatch: with capacity covering every
    token the output matches the unsharded MoE forward exactly."""
    rng = np.random.default_rng(10 + ep)
    b, t = ep * 2, 16
    ids, mask = _batch(rng, b=b, t=t)
    mesh = get_mesh({"ep": ep})
    # worst case: every local token routed to ONE destination chip →
    # cap must reach local_tokens (cf = ep), and every arrival routed to
    # ONE local expert → cap_e must reach the arrival buffer (ecf = E)
    fn = make_ep_encoder_a2a(
        CFG, mesh, n_experts=E, capacity_factor=float(ep),
        expert_capacity_factor=float(E),
    )
    emb_a2a, cls_a2a = fn(shard_params_ep(params, mesh), ids, mask)
    emb, cls = moe_encode_tokens(params, jnp.asarray(ids), jnp.asarray(mask), CFG, E)
    np.testing.assert_allclose(np.asarray(emb_a2a), np.asarray(emb), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cls_a2a), np.asarray(cls), atol=2e-4)


def test_a2a_capacity_overflow_drops_gracefully(params):
    """With a tiny capacity, overflowing tokens lose only their FFN delta
    (residual carries them): outputs stay finite and unit-norm."""
    rng = np.random.default_rng(20)
    ids, mask = _batch(rng, b=4, t=16)
    mesh = get_mesh({"ep": 4})
    fn = make_ep_encoder_a2a(CFG, mesh, n_experts=E, capacity_factor=0.1)
    emb, _ = fn(shard_params_ep(params, mesh), ids, mask)
    emb = np.asarray(emb)
    assert np.isfinite(emb).all()
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    # and it genuinely differs from the dropless result
    fn_full = make_ep_encoder_a2a(CFG, mesh, n_experts=E, capacity_factor=4.0)
    full = np.asarray(fn_full(shard_params_ep(params, mesh), ids, mask)[0])
    assert np.abs(emb - full).max() > 1e-6


def test_a2a_block_matmul_flops_below_psum(params):
    """The a2a receiver runs ONE batched matmul over per-expert blocks —
    per-chip FFN FLOPs scale with routed tokens, ~ep× below the
    psum-combine variant that evaluates local experts over ALL tokens
    (VERDICT r2 item 7)."""
    import jax

    rng = np.random.default_rng(30)
    ep = 8
    b, t = ep * 2, 16
    ids, mask = _batch(rng, b=b, t=t)
    mesh = get_mesh({"ep": ep})
    sharded = shard_params_ep(params, mesh)

    fn_psum = make_ep_encoder(CFG, mesh, n_experts=E)
    fn_a2a = make_ep_encoder_a2a(
        CFG, mesh, n_experts=E, capacity_factor=1.0, expert_capacity_factor=1.0
    )
    c_psum = fn_psum.lower(sharded, ids, mask).compile().cost_analysis()
    c_a2a = fn_a2a.lower(sharded, ids, mask).compile().cost_analysis()
    if not c_psum or "flops" not in c_psum or not c_a2a:
        pytest.skip("backend reports no cost analysis")
    # psum chip: n_local experts × ALL b·t tokens; a2a chip: ~b·t/ep
    # routed tokens through one blocked matmul. Attention flops are
    # common to both, so demand a conservative 2× total-flop gap.
    assert c_a2a["flops"] < 0.5 * c_psum["flops"], (
        c_a2a["flops"], c_psum["flops"],
    )


def test_load_balancing_loss(params):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64, CFG.d_model)).astype(np.float32))
    idx, _, probs = _route(x, params["layers"]["router"][0])
    loss = float(load_balancing_loss(probs, idx, E))
    assert loss >= 1.0  # ≥ 1 by Cauchy-Schwarz; == 1 at perfect balance
    # a collapsed router (everything to expert 0) must score worse
    collapsed = jnp.zeros_like(idx)
    one_probs = jnp.zeros_like(probs).at[..., 0].set(1.0)
    assert float(load_balancing_loss(one_probs, collapsed, E)) == pytest.approx(E)
