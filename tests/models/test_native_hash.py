"""Native C fasthash kernel: parity with the Python fallback."""

import numpy as np
import pytest

from youtu_rag_tpu.models.embedder import HashEmbedder


TEXTS = [
    "Hello WORLD, this is a test! 你好世界 mixed ASCII and 中文 tokens.",
    "the quick brown fox jumps over the lazy dog",
    "",
    "symbols: @#$% (parens) [brackets] & more",
    "répétition café emoji 🚀 test",
    "repeated repeated repeated words words tf weighting",
    "x" * 500,  # long word-run truncation path
]


def test_native_matches_python_fallback():
    nat = HashEmbedder(dim=256, use_native=True)
    py = HashEmbedder(dim=256, use_native=False)
    a = nat.embed_batch(TEXTS)
    b = py.embed_batch(TEXTS)
    if not _native_available():
        pytest.skip("no C compiler; fallback-only environment")
    np.testing.assert_allclose(a, b, atol=1e-6)


def _native_available() -> bool:
    from youtu_rag_tpu.native import get_fasthash

    return get_fasthash()[1] is not None


def test_empty_and_unicode_edge_cases():
    e = HashEmbedder(dim=128)
    out = e.embed_batch(["", "   ", "\n\t"])
    assert out.shape == (3, 128)
    assert (np.linalg.norm(out, axis=1) <= 1.0 + 1e-5).all()


def test_hash_embedder_deterministic_across_instances():
    a = HashEmbedder(dim=128).embed_batch(["stable text"])[0]
    b = HashEmbedder(dim=128).embed_batch(["stable text"])[0]
    np.testing.assert_array_equal(a, b)
