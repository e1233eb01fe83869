"""Finetune pipeline: ICT pair synthesis, training loop, npz deployment
(script: scripts/train_embedder.py; core: models/train.py)."""

import importlib.util
import sys
from pathlib import Path

import numpy as np


def _mod():
    path = Path(__file__).resolve().parents[2] / "scripts" / "train_embedder.py"
    spec = importlib.util.spec_from_file_location("train_embedder", path)
    m = importlib.util.module_from_spec(spec)
    sys.modules["train_embedder"] = m
    spec.loader.exec_module(m)
    return m


def test_ict_pairs_and_batches(tmp_path):
    m = _mod()
    (tmp_path / "a.md").write_text(
        "TPUs multiply matrices with a systolic array. HBM feeds the MXU. "
        "XLA compiles the graph ahead of time. Collectives ride the ICI links. "
        "Sharding is declared with NamedSharding annotations."
    )
    pairs = m.ict_pairs_from_corpus(tmp_path, chunk_size=400, seed=0)
    assert pairs, "expected ICT pairs from a multi-sentence chunk"
    q, p = pairs[0]
    assert q not in p  # the query span is removed from its positive

    from youtu_rag_tpu.models.tokenizer import HashTokenizer

    tok = HashTokenizer(1024, 32)
    batches = list(m.make_batches(pairs, tok, batch=4, seqlen=32, steps=3, seed=0))
    assert len(batches) == 3
    assert batches[0]["q_ids"].shape == (4, 32)
    assert batches[0]["q_mask"].sum() > 0


def test_train_loss_decreases_and_npz_deploys(tmp_path):
    m = _mod()
    import jax

    from youtu_rag_tpu.models.embedder import TpuEmbedder
    from youtu_rag_tpu.models.encoder import (
        EncoderConfig,
        init_encoder_params,
        load_params_npz,
        save_params_npz,
    )
    from youtu_rag_tpu.models.tokenizer import HashTokenizer
    from youtu_rag_tpu.models.train import TrainConfig, make_optimizer, make_train_step

    cfg = EncoderConfig(
        vocab_size=1024, d_model=64, n_layers=2, n_heads=2, d_ff=128, max_len=32, out_dim=64
    )
    tc = TrainConfig(learning_rate=3e-3, warmup_steps=2, total_steps=12, remat=False)
    opt = make_optimizer(tc)
    params = init_encoder_params(cfg, 0)
    opt_state = opt.init(params)
    step_fn = jax.jit(make_train_step(cfg, tc, opt))

    pairs = [(f"unique query token q{i}", f"document body d{i} with text") for i in range(8)]
    tok = HashTokenizer(cfg.vocab_size, cfg.max_len)
    losses = []
    for batch in m.make_batches(pairs, tok, batch=8, seqlen=32, steps=12, seed=0):
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses[0]} -> {losses[-1]}"

    # deployment roundtrip: npz -> TpuEmbedder, embeddings match the live params
    npz = tmp_path / "params.npz"
    save_params_npz(jax.device_get(params), npz)
    emb_live = TpuEmbedder(config=cfg, params=params)
    emb_npz = TpuEmbedder(config=cfg, params=load_params_npz(npz))
    v1 = emb_live.embed_batch(["hello world"])
    v2 = emb_npz.embed_batch(["hello world"])
    np.testing.assert_allclose(v1, v2, atol=1e-5)
    assert abs(float(np.linalg.norm(v1[0])) - 1.0) < 1e-3  # L2-normalized
