"""Training-step tests: loss decreases, dp×tp sharding compiles + runs on
the 8-virtual-device mesh."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_cfg():
    from youtu_rag_tpu.models.encoder import EncoderConfig

    return EncoderConfig(
        vocab_size=512, d_model=32, n_layers=2, n_heads=2, d_ff=64, max_len=32, out_dim=16
    )


def _batch(rng, b, t, vocab):
    ids = rng.integers(4, vocab, size=(b, t)).astype(np.int32)
    mask = np.ones((b, t), np.float32)
    return {
        "q_ids": ids,
        "q_mask": mask,
        "d_ids": ids.copy(),  # positives = same tokens → learnable signal
        "d_mask": mask.copy(),
    }


def test_loss_decreases(tiny_cfg, rng):
    import jax

    from youtu_rag_tpu.models.encoder import init_encoder_params
    from youtu_rag_tpu.models.train import TrainConfig, make_optimizer, make_train_step

    tc = TrainConfig(learning_rate=3e-3, warmup_steps=2, total_steps=50, remat=False)
    opt = make_optimizer(tc)
    params = init_encoder_params(tiny_cfg, seed=0)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(tiny_cfg, tc, opt))

    losses = []
    for i in range(10):
        batch = _batch(rng, 8, 16, tiny_cfg.vocab_size)
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_sharded_train_step(tiny_cfg, rng):
    from youtu_rag_tpu.models.train import TrainConfig, make_sharded_train_step
    from youtu_rag_tpu.parallel.mesh import get_mesh

    mesh = get_mesh({"dp": 4, "tp": 2})
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=2, total_steps=20)
    params, opt_state, step = make_sharded_train_step(tiny_cfg, tc, mesh)
    batch = _batch(rng, 16, 16, tiny_cfg.vocab_size)
    params, opt_state, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params keep their tp sharding after the step
    wq = params["layers"]["wq"]
    assert "tp" in str(wq.sharding)
