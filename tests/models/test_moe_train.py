"""MoE training recipe: aux loss rides the objective, router learns
balance, dp×ep sharded step compiles + runs on the 8-virtual-device mesh,
and the sharded step matches the unsharded step numerically."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_cfg():
    from youtu_rag_tpu.models.encoder import EncoderConfig

    return EncoderConfig(
        vocab_size=512, d_model=32, n_layers=2, n_heads=2, d_ff=64, max_len=32, out_dim=16
    )


E = 4  # experts


def _batch(rng, b, t, vocab):
    ids = rng.integers(4, vocab, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.float32)
    return {"q_ids": ids, "q_mask": mask, "d_ids": ids.copy(), "d_mask": mask.copy()}


def test_aux_loss_in_objective_and_metrics(tiny_cfg, rng):
    import jax

    from youtu_rag_tpu.models.train import MoETrainConfig, moe_info_nce_loss
    from youtu_rag_tpu.parallel.expert_parallel import init_moe_params

    params = init_moe_params(tiny_cfg, E, seed=0)
    batch = _batch(rng, 8, 16, tiny_cfg.vocab_size)

    tc0 = MoETrainConfig(n_experts=E, aux_loss_weight=0.0, remat=False)
    tc1 = MoETrainConfig(n_experts=E, aux_loss_weight=1.0, remat=False)
    loss0, m0 = moe_info_nce_loss(params, batch, tiny_cfg, tc0)
    loss1, m1 = moe_info_nce_loss(params, batch, tiny_cfg, tc1)
    aux = float(m0["aux_loss"])
    assert aux > 0.0
    # the weighted aux term is exactly the difference between objectives
    np.testing.assert_allclose(float(loss1) - float(loss0), aux, rtol=1e-5)
    np.testing.assert_allclose(float(m0["contrastive_loss"]), float(loss0), rtol=1e-6)

    # router gradient flows ONLY through the aux term (top-1 argmax blocks
    # the contrastive path except via the selected-expert prob weighting)
    g1 = jax.grad(lambda p: moe_info_nce_loss(p, batch, tiny_cfg, tc1)[0])(params)
    assert float(np.abs(np.asarray(g1["layers"]["router"])).max()) > 0.0


def test_moe_loss_decreases_and_balance_improves(tiny_cfg, rng):
    import jax

    from youtu_rag_tpu.models.train import (
        MoETrainConfig,
        make_moe_train_step,
        make_optimizer,
    )
    from youtu_rag_tpu.parallel.expert_parallel import init_moe_params

    tc = MoETrainConfig(
        learning_rate=3e-3, warmup_steps=2, total_steps=50, remat=False,
        n_experts=E, aux_loss_weight=1e-2,
    )
    opt = make_optimizer(tc)
    params = init_moe_params(tiny_cfg, E, seed=0)
    opt_state = opt.init(params)
    step = jax.jit(make_moe_train_step(tiny_cfg, tc, opt))

    batch = _batch(rng, 8, 16, tiny_cfg.vocab_size)  # fixed batch →
    losses, auxes = [], []                           # deterministic descent
    for _ in range(10):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
        auxes.append(float(metrics["aux_loss"]))
    assert losses[-1] < losses[0]
    # perfectly balanced top-1 routing has aux = 1.0; training with the
    # aux term must not blow balance up
    assert auxes[-1] < max(auxes[0] * 1.5, float(E))


def test_sharded_moe_train_step(tiny_cfg, rng):
    from youtu_rag_tpu.models.train import MoETrainConfig, make_sharded_moe_train_step
    from youtu_rag_tpu.parallel.mesh import get_mesh

    mesh = get_mesh({"dp": 2, "ep": 4})
    tc = MoETrainConfig(
        learning_rate=1e-3, warmup_steps=2, total_steps=20, n_experts=E, remat=False
    )
    params, opt_state, step = make_sharded_moe_train_step(tiny_cfg, tc, mesh)
    batch = _batch(rng, 8, 16, tiny_cfg.vocab_size)
    params, opt_state, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["aux_loss"]) > 0.0
    # expert stacks keep their ep sharding after the step; routers replicate
    assert "ep" in str(params["layers"]["ew1"].sharding.spec)
    assert "ep" not in str(params["layers"]["router"].sharding.spec)


def test_sharded_matches_unsharded_one_step(tiny_cfg, rng):
    import jax

    from youtu_rag_tpu.models.train import (
        MoETrainConfig,
        make_moe_train_step,
        make_optimizer,
        make_sharded_moe_train_step,
    )
    from youtu_rag_tpu.parallel.expert_parallel import init_moe_params
    from youtu_rag_tpu.parallel.mesh import get_mesh

    tc = MoETrainConfig(
        learning_rate=1e-3, warmup_steps=2, total_steps=20, n_experts=E, remat=False
    )
    batch = _batch(rng, 8, 16, tiny_cfg.vocab_size)

    init = init_moe_params(tiny_cfg, E, seed=3)
    opt = make_optimizer(tc)
    ref_params, ref_os, _ = (init, opt.init(init), None)
    ref_step = jax.jit(make_moe_train_step(tiny_cfg, tc, opt))
    ref_params, ref_os, ref_metrics = ref_step(ref_params, ref_os, batch)

    mesh = get_mesh({"dp": 2, "ep": 4})
    params, opt_state, step = make_sharded_moe_train_step(
        tiny_cfg, tc, mesh, init_params=init
    )
    params, opt_state, metrics = step(params, opt_state, batch)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(params["layers"]["ew1"]),
        np.asarray(ref_params["layers"]["ew1"]),
        atol=2e-5,
    )
