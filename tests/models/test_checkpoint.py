import numpy as np
import pytest


def test_train_checkpoint_roundtrip(tmp_path, rng):
    import jax

    from youtu_rag_tpu.models.checkpoint import TrainCheckpointer
    from youtu_rag_tpu.models.encoder import EncoderConfig, init_encoder_params
    from youtu_rag_tpu.models.train import TrainConfig, make_optimizer, make_train_step

    cfg = EncoderConfig(
        vocab_size=256, d_model=32, n_layers=2, n_heads=2, d_ff=64, max_len=16, out_dim=16
    )
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10, remat=False)
    opt = make_optimizer(tc)
    params = init_encoder_params(cfg, seed=0)
    opt_state = opt.init(params)
    step_fn = jax.jit(make_train_step(cfg, tc, opt))
    batch = {
        "q_ids": rng.integers(4, 256, (4, 8)).astype(np.int32),
        "q_mask": np.ones((4, 8), np.float32),
        "d_ids": rng.integers(4, 256, (4, 8)).astype(np.int32),
        "d_mask": np.ones((4, 8), np.float32),
    }
    params, opt_state, _ = step_fn(params, opt_state, batch)

    ckpt = TrainCheckpointer(tmp_path / "ckpt")
    ckpt.save(1, params, opt_state, {"note": "after one step"})
    assert ckpt.latest_step() == 1

    # templates recover pytree structure (optax NamedTuples)
    r_params, r_opt, meta = ckpt.restore(
        params_like=init_encoder_params(cfg, seed=1),
        opt_state_like=opt.init(init_encoder_params(cfg, seed=1)),
    )
    assert meta["note"] == "after one step"
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(r_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training resumes from the restored state
    p2, o2, metrics = step_fn(r_params, r_opt, batch)
    assert np.isfinite(float(metrics["loss"]))

    # rolling retention
    ckpt.save(2, p2, o2)
    ckpt.save(3, p2, o2)
    ckpt.save(4, p2, o2)
    ckpt.save(5, p2, o2)
    assert ckpt.latest_step() == 5
    ckpt.close()
