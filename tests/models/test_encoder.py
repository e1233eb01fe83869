import numpy as np
import pytest

from youtu_rag_tpu.models.tokenizer import CLS_ID, PAD_ID, SEP_ID, HashTokenizer


@pytest.fixture(scope="module")
def tiny_cfg():
    from youtu_rag_tpu.models.encoder import EncoderConfig

    return EncoderConfig(
        vocab_size=1024, d_model=64, n_layers=2, n_heads=4, d_ff=128, max_len=64, out_dim=32
    )


def test_tokenizer_deterministic():
    tok = HashTokenizer(vocab_size=1024)
    a = tok.encode("Hello, TPU world! 你好")
    b = tok.encode("Hello, TPU world! 你好")
    assert a == b
    assert a[0] == CLS_ID and a[-1] == SEP_ID
    assert all(t >= 4 for t in a[1:-1])


def test_tokenizer_batch_padding():
    tok = HashTokenizer(vocab_size=1024)
    ids, mask = tok.batch(["one two three", "one"])
    assert ids.shape == mask.shape
    assert mask[0].sum() == 5  # cls + 3 + sep
    assert mask[1].sum() == 3
    assert (ids[1][3:] == PAD_ID).all()


def test_encoder_forward_shapes(tiny_cfg):
    import jax.numpy as jnp

    from youtu_rag_tpu.models.encoder import encode_tokens, init_encoder_params

    params = init_encoder_params(tiny_cfg, seed=0)
    ids = jnp.ones((4, 16), jnp.int32)
    mask = jnp.ones((4, 16), jnp.float32)
    emb, cls = encode_tokens(params, ids, mask, tiny_cfg)
    assert emb.shape == (4, 32)
    assert cls.shape == (4, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-4)


def test_encoder_padding_invariance(tiny_cfg):
    """Padding columns must not change the embedding (mask correctness)."""
    import jax.numpy as jnp

    from youtu_rag_tpu.models.encoder import encode_tokens, init_encoder_params

    params = init_encoder_params(tiny_cfg, seed=0)
    ids = jnp.asarray(np.array([[1, 5, 6, 7, 2]], np.int32))
    mask = jnp.ones((1, 5), jnp.float32)
    emb1, _ = encode_tokens(params, ids, mask, tiny_cfg)
    ids_p = jnp.concatenate([ids, jnp.zeros((1, 11), jnp.int32)], axis=1)
    mask_p = jnp.concatenate([mask, jnp.zeros((1, 11), jnp.float32)], axis=1)
    emb2, _ = encode_tokens(params, ids_p, mask_p, tiny_cfg)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2), atol=2e-2)


def test_tpu_embedder_end_to_end(tiny_cfg):
    from youtu_rag_tpu.models.embedder import TpuEmbedder

    emb = TpuEmbedder(config=tiny_cfg, batch_size=8)
    vecs = emb.embed_batch(["the quick brown fox", "the quick brown fox", "completely different text"])
    assert vecs.shape == (3, 32)
    np.testing.assert_allclose(vecs[0], vecs[1], atol=1e-5)  # identical text
    assert np.dot(vecs[0], vecs[2]) < 0.999


def test_hash_embedder_similarity():
    from youtu_rag_tpu.models.embedder import HashEmbedder

    e = HashEmbedder(dim=128)
    a = e.embed_one("machine learning on tensor processing units")
    b = e.embed_one("tensor processing units for machine learning")
    c = e.embed_one("recipe for chocolate cake with strawberries")
    assert a @ b > 0.8
    assert abs(a @ c) < 0.5


def test_lexical_reranker():
    import asyncio

    from youtu_rag_tpu.core.types import Chunk, RetrievalResult
    from youtu_rag_tpu.models.reranker import LexicalReranker

    docs = [
        "the capital of france is paris",
        "bananas are yellow fruit",
        "paris is in france, the capital city",
    ]
    results = [
        RetrievalResult(Chunk(f"c{i}", "d", t, i), score=0.5) for i, t in enumerate(docs)
    ]
    rr = LexicalReranker()
    out = asyncio.run(rr.rerank("capital of france", results, top_k=2))
    assert len(out) == 2
    assert {out[0].chunk.id, out[1].chunk.id} == {"c0", "c2"}
    assert out[0].rank == 1


def test_tpu_reranker_scores(tiny_cfg):
    import asyncio

    from youtu_rag_tpu.core.types import Chunk, RetrievalResult
    from youtu_rag_tpu.models.reranker import TpuReranker

    rr = TpuReranker(config=tiny_cfg, batch_size=4)
    results = [
        RetrievalResult(Chunk(f"c{i}", "d", f"text number {i}", i), score=0.5) for i in range(5)
    ]
    out = asyncio.run(rr.rerank("some query", results))
    assert len(out) == 5
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    assert all(out[i].score >= out[i + 1].score for i in range(4))
