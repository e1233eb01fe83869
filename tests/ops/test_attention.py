import numpy as np
import pytest


def test_blockwise_attention_matches_xla(rng):
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.attention import blockwise_attention

    b, h, t, hd = 2, 4, 256, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    mask = np.ones((b, t), np.float32)
    mask[1, 100:] = 0.0  # padding on the second row
    bias = jnp.asarray((1.0 - mask) * -1e9)

    got = blockwise_attention(q, k, v, bias, block_q=128, interpret=True)

    scores = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(hd)
    scores = scores + np.asarray(bias)[:, None, None, :]
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_encoder_pallas_attention_matches_xla(rng):
    import jax.numpy as jnp

    from youtu_rag_tpu.models.encoder import EncoderConfig, encode_tokens, init_encoder_params

    kw = dict(vocab_size=512, d_model=128, n_layers=2, n_heads=2, d_ff=256, max_len=256, out_dim=32)
    cfg_x = EncoderConfig(**kw, attention_impl="xla")
    cfg_p = EncoderConfig(**kw, attention_impl="pallas_interpret")
    params = init_encoder_params(cfg_x, seed=0)
    ids = jnp.asarray(rng.integers(4, 512, (2, 256)).astype(np.int32))
    mask = jnp.asarray((np.arange(256)[None, :] < np.array([[256], [180]])).astype(np.float32))
    a, _ = encode_tokens(params, ids, mask, cfg_x)
    b, _ = encode_tokens(params, ids, mask, cfg_p)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-2)
    # paths genuinely differ: short sequences fall back to XLA
    ids_s = ids[:, :128]
    mask_s = mask[:, :128]
    c, _ = encode_tokens(params, ids_s, mask_s, cfg_p)  # t<256 → xla path
    assert np.isfinite(np.asarray(c)).all()


def test_flash_attention_matches_xla(rng):
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.attention import flash_attention

    b, h, t, hd = 1, 2, 1024, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    mask = np.ones((b, t), np.float32)
    mask[0, 700:] = 0.0
    bias = jnp.asarray((1.0 - mask) * -1e9)

    got = flash_attention(q, k, v, bias, block_q=256, block_k=256, interpret=True)

    scores = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(hd)
    scores = scores + np.asarray(bias)[:, None, None, :]
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_flash_matches_blockwise(rng):
    """Online-softmax recurrence agrees with the single-pass kernel."""
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.attention import blockwise_attention, flash_attention

    b, h, t, hd = 2, 2, 512, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    bias = jnp.zeros((b, t), jnp.float32)
    a = blockwise_attention(q, k, v, bias, block_q=128, interpret=True)
    f = flash_attention(q, k, v, bias, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(f), atol=2e-4)


def test_flash_stats_reconstructs_flash(rng):
    """flash_attention_stats returns (acc, m, l) whose normalized form
    equals flash_attention, and two half-sequence stat calls merged with
    the online-softmax combine equal the full-sequence result — the exact
    recurrence the ring-attention hops use (VERDICT r2 item 8)."""
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.attention import flash_attention, flash_attention_stats

    b, h, t, hd = 1, 2, 512, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    mask = np.ones((b, t), np.float32)
    mask[0, 400:] = 0.0
    bias = jnp.asarray((1.0 - mask) * -1e9)

    acc, m, l = flash_attention_stats(q, k, v, bias, block_q=256, block_k=256, interpret=True)
    full = flash_attention(q, k, v, bias, block_q=256, block_k=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(acc) / np.maximum(np.asarray(l)[..., None], 1e-30),
        np.asarray(full), atol=2e-4,
    )

    # split K/V in two hops and merge — the ring recurrence
    h1 = flash_attention_stats(q, k[:, :, :256], v[:, :, :256], bias[:, :256],
                               block_q=256, block_k=256, interpret=True)
    h2 = flash_attention_stats(q, k[:, :, 256:], v[:, :, 256:], bias[:, 256:],
                               block_q=256, block_k=256, interpret=True)
    a1, m1, l1 = (np.asarray(x) for x in h1)
    a2, m2, l2 = (np.asarray(x) for x in h2)
    m_new = np.maximum(m1, m2)
    w1 = np.exp(m1 - m_new)
    w2 = np.exp(m2 - m_new)
    merged = (a1 * w1[..., None] + a2 * w2[..., None]) / np.maximum(
        (l1 * w1 + l2 * w2)[..., None], 1e-30
    )
    np.testing.assert_allclose(merged, np.asarray(full), atol=2e-4)
