"""BPE tokenizer parity vs the HF ``tokenizers`` runtime.

A byte-level BPE is TRAINED in-test with ``tokenizers`` (available as a
transformers dependency), saved as tokenizer.json, loaded by the
self-contained reader (models/bpe.py), and both must encode a battery of
tricky strings identically — contractions, unicode, numbers, whitespace
runs, emoji (multi-byte UTF-8). Decode must round-trip. This is the
causal-LM analogue of test_native_tokenizer.py's WordPiece parity."""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from youtu_rag_tpu.models.bpe import BPETokenizer, _gpt2_word_split, bytes_to_unicode

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "hello world, hello tokenizer! it's a test isn't it?",
    "Numbers: 12345 67 8.9 and units like 10km or 3x4.",
    "def f(x):\n    return x * 2  # comment\n",
    "中文混合 English text avec français und Deutsch.",
    "spaces   and\ttabs\nand newlines",
    "HTTP/1.1 GET https://example.com/a?b=c&d=e",
    "email: someone@example.org; path=/usr/local/bin",
] * 4

TRICKY = [
    "Hello, world!",
    "it's we've they'll I'd you're can't",
    "  leading spaces and   runs",
    "trailing space ",
    "tabs\tbetween\twords",
    "multi\n\nnewlines\n",
    "numbers 123 mixed42 with7text",
    "ALLCAPS and CamelCase and snake_case",
    "unicode: 中文 → ∑ π émigré naïve",
    "emoji 🚀🔥 multi-byte",
    "punctuation!!! ... --- ???",
    "quotes \"double\" and 'single'",
    "",
    "a",
    " ",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train a small byte-level BPE and return (path, hf_tokenizer)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=420,
        special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer)
    d = tmp_path_factory.mktemp("bpe")
    path = d / "tokenizer.json"
    tok.save(str(path))
    return path, tok


def test_encode_parity_vs_hf(trained):
    path, hf = trained
    ours = BPETokenizer.from_tokenizer_json(path)
    for text in TRICKY + CORPUS[:8]:
        expect = hf.encode(text).ids
        got = ours.encode(text)
        assert got == expect, f"{text!r}: {got} != {expect}"


def test_decode_round_trip(trained):
    path, _ = trained
    ours = BPETokenizer.from_tokenizer_json(path)
    for text in TRICKY + CORPUS[:8]:
        assert ours.decode(ours.encode(text)) == text


def test_eos_detected_and_special_skipped(trained):
    path, _ = trained
    ours = BPETokenizer.from_tokenizer_json(path)
    assert ours.eos_token == "<|endoftext|>"
    assert isinstance(ours.eos_id, int)
    ids = ours.encode("hi") + [ours.eos_id]
    assert ours.decode(ids) == "hi"


def test_vocab_json_merges_txt_fallback(trained, tmp_path):
    """The older two-file export loads through the same class."""
    path, hf = trained
    with open(path, encoding="utf-8") as f:
        tj = json.load(f)
    vocab = tj["model"]["vocab"]
    with open(tmp_path / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(tmp_path / "merges.txt", "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for m in tj["model"]["merges"]:
            f.write((m if isinstance(m, str) else " ".join(m)) + "\n")
    ours = BPETokenizer.from_dir(tmp_path)
    for text in TRICKY[:8]:
        assert ours.decode(ours.encode(text)) == text


def test_gpt2_word_split_behavior():
    """Scanner vs the published GPT-2 pattern on representative cases."""
    assert _gpt2_word_split("Hello, world!") == ["Hello", ",", " world", "!"]
    assert _gpt2_word_split("it's") == ["it", "'s"]
    assert _gpt2_word_split("we've they'll") == ["we", "'ve", " they", "'ll"]
    assert _gpt2_word_split("a  b") == ["a", " ", " b"]
    assert _gpt2_word_split("x   y") == ["x", "  ", " y"]
    assert _gpt2_word_split("tab\tz") == ["tab", "\t", "z"]
    assert _gpt2_word_split("num 123x") == ["num", " 123", "x"]
    assert _gpt2_word_split("end ") == ["end", " "]
    assert _gpt2_word_split("中文ab") == ["中文ab"] or _gpt2_word_split("中文ab") == ["中", "文", "ab"]


def test_bytes_to_unicode_bijective():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_metaspace_scheme_byte_fallback():
    """LLaMA-style tokenizer.json: metaspace words + <0xNN> byte fallback."""
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2, "▁": 3, "▁he": 4, "llo": 5,
             "▁world": 6, "h": 7, "e": 8, "l": 9, "o": 10, "▁h": 11}
    for i in range(256):
        vocab[f"<0x{i:02X}>"] = 12 + i
    merges = [("▁", "h"), ("▁h", "e"), ("l", "l"), ("ll", "o"), ("▁", "world")]
    tok = BPETokenizer(
        vocab, merges, scheme="metaspace",
        added_tokens={"<s>": 1, "</s>": 2, "<unk>": 0},
        eos_token="</s>", bos_token="<s>",
    )
    ids = tok.encode("hello")
    assert tok.decode(ids) == "hello"
    # unknown unicode goes through byte fallback, decode restores it
    ids2 = tok.encode("héllo")
    assert tok.decode(ids2) == "héllo"


def test_decode_total_on_out_of_alphabet_vocab_chars():
    # vocabs read as byte_level can hold tokens whose chars are outside the
    # GPT-2 byte alphabet (e.g. special tokens kept in the main vocab, or
    # non-byte-level vocabs); decode must fall back to utf-8, not raise
    vocab = {"\x82bad": 0, "ok": 1}
    tok = BPETokenizer(vocab, [], scheme="byte_level")
    out = tok.decode([0, 1])
    assert "ok" in out  # 'o','k' are in the alphabet and round-trip
