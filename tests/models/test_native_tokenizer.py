"""C tokenizer fast path: exact parity with the Python reference
(native/fasthash.c tokenize_ids — blake2b-8 ids, unicode whitespace)."""

import numpy as np
import pytest

from youtu_rag_tpu.models import tokenizer as tok_mod
from youtu_rag_tpu.models.tokenizer import HashTokenizer
from youtu_rag_tpu.native import get_fasthash, tokenize_ids_native

CASES = [
    "Hello, World! HBM_bandwidth is 820 GB/s.",
    "中文分词测试：每个汉字一个 token。",
    "mixed 中English文 with   spaces\tand\nnewlines",
    "émigré café — naïve Ångström",
    "UPPER lower MiXeD 123_abc",
    "non-breaking space and ideographic　space",
    "",
    "a",
    "!@#$%^&*()",
    "x" * 500,
]

needs_native = pytest.mark.skipif(
    get_fasthash()[1] is None, reason="native kernel unavailable (no C compiler)"
)


@needs_native
@pytest.mark.parametrize("text", CASES, ids=range(len(CASES)))
def test_tokenize_parity(text, monkeypatch):
    tk = HashTokenizer(32768, 512)
    monkeypatch.setattr(tok_mod, "_USE_NATIVE", False)
    py = tk.tokenize(text)
    monkeypatch.setattr(tok_mod, "_USE_NATIVE", True)
    native = tk.tokenize(text)
    assert native == py
    # and the raw native call agrees too
    assert tokenize_ids_native(text, max(len(text), 1), 32768 - 4, 4) == py


@needs_native
def test_batch_parity(monkeypatch):
    tk = HashTokenizer(4096, 64)
    texts = CASES[:6] + ["short", "much longer text " * 30]
    monkeypatch.setattr(tok_mod, "_USE_NATIVE", False)
    ids_py, mask_py = tk.batch(texts)
    monkeypatch.setattr(tok_mod, "_USE_NATIVE", True)
    ids_c, mask_c = tk.batch(texts)
    np.testing.assert_array_equal(ids_c, ids_py)
    np.testing.assert_array_equal(mask_c, mask_py)


@needs_native
def test_blake2b_matches_hashlib():
    """The C blake2b-8 must match hashlib for arbitrary lengths (incl.
    >128-byte multi-block inputs)."""
    tk = HashTokenizer(1 << 30, 4096)  # huge vocab → ids expose raw hash mod
    for length in (1, 7, 63, 64, 127, 128, 129, 255, 256, 300):
        word = "w" * length  # one word token of that byte length
        assert tokenize_ids_native(word, 8, (1 << 30) - 4, 4) == tk_py(tk, word)


def tk_py(tk, text):
    import youtu_rag_tpu.models.tokenizer as m

    old = m._USE_NATIVE
    m._USE_NATIVE = False
    try:
        return tk.tokenize(text)
    finally:
        m._USE_NATIVE = old


@needs_native
def test_hash_embed_unicode_whitespace_parity():
    """NBSP/ideographic-space/NEL are Python \\s whitespace - the C
    embedder must skip them too (they tokenized as symbols before)."""
    from youtu_rag_tpu.models.embedder import HashEmbedder

    e_native = HashEmbedder(dim=128, use_native=True)
    e_py = HashEmbedder(dim=128, use_native=False)
    cases = [
        "a\u00a0b",   # NBSP
        "x\u3000y",   # ideographic space
        "p\u0085q",   # NEL
        "m\u001cn",   # ASCII file separator (in \\s)
    ]
    got = e_native.embed_batch(cases)
    want = e_py.embed_batch(cases)
    np.testing.assert_allclose(got, want, atol=1e-6)


@needs_native
def test_hash_embed_tf_table_overflow_falls_back():
    """>4096 distinct tokens: the C kernel reports failure and the
    wrapper re-embeds via Python instead of silently dropping tokens."""
    from youtu_rag_tpu.models.embedder import HashEmbedder

    text = " ".join(f"tok{i}" for i in range(6000))
    got = HashEmbedder(dim=256, use_native=True).embed_batch([text])[0]
    want = HashEmbedder(dim=256, use_native=False).embed_batch([text])[0]
    np.testing.assert_allclose(got, want, atol=1e-6)
