"""Lexical-residual encoder pathway (EncoderConfig.lex_pool/lex_buckets).

The dense-quality pillar (VERDICT r3 item 1): exact-identifier retrieval
needs token identity to survive pooling. These tests pin the mechanism —
not the benchmark numbers (benchmarks/quality_report_tpu.json carries
those with provenance)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from youtu_rag_tpu.models.encoder import (  # noqa: E402
    EncoderConfig,
    encode_tokens,
    init_encoder_params,
    load_encoder_config,
    load_params_npz,
    param_sharding_spec,
    save_encoder_config,
    save_params_npz,
)

CFG = EncoderConfig(
    vocab_size=512, d_model=64, n_layers=2, n_heads=2, d_ff=128,
    out_dim=64, max_len=48, lex_pool=True, lex_buckets=128,
)


@pytest.fixture(scope="module")
def params():
    return init_encoder_params(CFG, seed=0)


def _ids(rng, n=3, t=24):
    return jnp.asarray(rng.integers(4, CFG.vocab_size, (n, t)).astype(np.int32))


def test_embed_dim_and_norm(params):
    rng = np.random.default_rng(0)
    ids = _ids(rng)
    mask = jnp.ones(ids.shape, jnp.float32)
    emb, cls = encode_tokens(params, ids, mask, CFG)
    assert emb.shape == (3, CFG.embed_dim) == (3, 64 + 128)
    assert np.allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-5)


def test_gate_initialized_lexical_heavy(params):
    g = 1.0 / (1.0 + np.exp(-float(params["lex_mix"])))
    assert abs(g - CFG.lex_gate_init) < 1e-5


def test_exact_token_overlap_dominates_ranking(params):
    """A query sharing one rare token with doc A (random init, zero
    training) must rank A above doc B sharing none — the property plain
    contextual mean-pooling does not give at random init."""
    rng = np.random.default_rng(1)
    base = rng.integers(4, CFG.vocab_size, 24).astype(np.int32)
    needle = 333
    query = np.concatenate([[needle], rng.integers(4, CFG.vocab_size, 5)]).astype(np.int32)
    doc_a = base.copy(); doc_a[10] = needle
    doc_b = base.copy()  # same context, no needle
    ids = jnp.asarray(np.stack([
        np.pad(query, (0, 24 - len(query))), doc_a, doc_b,
    ]))
    mask = (ids != 0).astype(jnp.float32)
    emb, _ = encode_tokens(init_encoder_params(CFG, seed=3), ids, mask, CFG)
    e = np.asarray(emb)
    assert e[0] @ e[1] > e[0] @ e[2] + 0.01


def test_jit_parity_and_grad_flow(params):
    import optax

    from youtu_rag_tpu.models.train import TrainConfig, make_optimizer, make_train_step

    rng = np.random.default_rng(2)
    ids = _ids(rng, n=4)
    mask = jnp.ones(ids.shape, jnp.float32)
    eager, _ = encode_tokens(params, ids, mask, CFG)
    jitted = jax.jit(lambda p, i, m: encode_tokens(p, i, m, CFG)[0])(params, ids, mask)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=2e-5)

    tc = TrainConfig(total_steps=4, warmup_steps=1, remat=False)
    opt = make_optimizer(tc)
    d_ids = _ids(np.random.default_rng(5), n=4)
    batch = {"q_ids": ids, "q_mask": mask, "d_ids": d_ids, "d_mask": mask}
    step = jax.jit(make_train_step(CFG, tc, opt))
    p2, st = params, opt.init(params)
    for _ in range(3):  # warmup schedule starts at lr=0 — step past it
        p2, st, metrics = step(p2, st, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(jnp.abs(p2["tok_weight"] - params["tok_weight"]).max()) > 0, (
        "lexical token weights received no gradient"
    )


def test_npz_and_config_roundtrip(params, tmp_path):
    save_params_npz(jax.device_get(params), tmp_path / "p.npz")
    save_encoder_config(CFG, tmp_path / "cfg.json")
    cfg2 = load_encoder_config(tmp_path / "cfg.json")
    assert cfg2.lex_pool and cfg2.lex_buckets == 128 and cfg2.embed_dim == 192
    p2 = load_params_npz(tmp_path / "p.npz")
    rng = np.random.default_rng(4)
    ids = _ids(rng)
    mask = jnp.ones(ids.shape, jnp.float32)
    a, _ = encode_tokens(params, ids, mask, CFG)
    b, _ = encode_tokens(p2, ids, mask, cfg2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharding_spec_covers_lex_params(params):
    spec = param_sharding_spec(CFG)
    assert "tok_weight" in spec and "lex_mix" in spec and "lex_proj" not in spec
    flat_p = jax.tree.leaves(params)
    flat_s = jax.tree.leaves(spec, is_leaf=lambda x: hasattr(x, "index"))
    assert len(flat_p) == len(flat_s)


def test_embedder_dimension_reports_concat(tmp_path, params):
    from youtu_rag_tpu.models.embedder import TpuEmbedder

    emb = TpuEmbedder(config=CFG, params=params, batch_size=8)
    assert emb.dimension == CFG.embed_dim
    out = emb.embed_batch(["registry code ZX-17", "unrelated prose"])
    assert out.shape == (2, CFG.embed_dim)
    assert np.isfinite(out).all()
