"""TpuEmbedder long-document path: over-length texts embed through the
sequence-parallel ring-attention forward instead of being truncated."""

import numpy as np

import jax.numpy as jnp

from youtu_rag_tpu.models.embedder import TpuEmbedder
from youtu_rag_tpu.models.encoder import EncoderConfig, encode_tokens
from youtu_rag_tpu.parallel.mesh import get_mesh

CFG = EncoderConfig(
    vocab_size=4096, d_model=32, n_layers=2, n_heads=4, d_ff=64, max_len=32,
    out_dim=16, dtype=jnp.float32,
)


def _words(n, seed=0):
    rng = np.random.default_rng(seed)
    return " ".join(f"w{rng.integers(0, 500)}" for _ in range(n))


def test_long_text_routes_through_sp_and_keeps_tail_content():
    mesh = get_mesh({"sp": 4})
    emb_sp = TpuEmbedder(config=CFG, sp_mesh=mesh, seed=0)
    emb_plain = TpuEmbedder(config=CFG, params=emb_sp.params, seed=0)

    short = _words(8)
    long = _words(120)  # 120 tokens ≫ max_len 32
    long_tail_changed = long[:-12] + " zebra unique"

    # short texts agree between the two embedders (same params, same path)
    np.testing.assert_allclose(
        emb_sp.embed_batch([short]), emb_plain.embed_batch([short]), atol=1e-5
    )

    v_long = emb_sp.embed_batch([long])[0]
    v_tail = emb_sp.embed_batch([long_tail_changed])[0]
    # tail content past max_len influences the SP embedding…
    assert np.abs(v_long - v_tail).max() > 1e-6
    # …but not the truncated plain embedding
    t_long = emb_plain.embed_batch([long])[0]
    t_tail = emb_plain.embed_batch([long_tail_changed])[0]
    np.testing.assert_allclose(t_long, t_tail, atol=1e-6)


def test_long_path_matches_unsharded_full_length():
    mesh = get_mesh({"sp": 4})
    emb_sp = TpuEmbedder(config=CFG, sp_mesh=mesh, seed=1)
    long = _words(100, seed=3)

    got = emb_sp.embed_batch([long])[0]

    seqs = [emb_sp.tokenizer.encode(long, emb_sp._long_max)]
    t_b = emb_sp._bucket(len(seqs[0]), 64)
    ids = np.zeros((1, t_b), np.int32)
    mask = np.zeros((1, t_b), np.float32)
    ids[0, : len(seqs[0])] = seqs[0]
    mask[0, : len(seqs[0])] = 1.0
    want, _ = encode_tokens(emb_sp.params, jnp.asarray(ids), jnp.asarray(mask), CFG)
    np.testing.assert_allclose(got, np.asarray(want)[0], atol=2e-5)


def test_mixed_batch_preserves_row_order():
    mesh = get_mesh({"sp": 4})
    emb = TpuEmbedder(config=CFG, sp_mesh=mesh, seed=2)
    texts = [_words(6, 1), _words(90, 2), _words(7, 3)]
    mixed = emb.embed_batch(texts)
    solo = np.stack([emb.embed_batch([t])[0] for t in texts])
    np.testing.assert_allclose(mixed, solo, atol=1e-5)
    assert mixed.shape == (3, CFG.out_dim)
