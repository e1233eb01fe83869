"""Deterministic hashing tokenizer.

The reference never tokenizes — it POSTs text to remote embedding/LLM
services (``utu/rag/embeddings/service_embedder.py``). The TPU build runs
the encoder in-process, so it needs a tokenizer that works offline with
zero downloaded assets: words (and CJK codepoints) map to stable 32-bit
hash buckets. A HuggingFace tokenizer can be swapped in when local vocab
files exist (``transformers`` is in the image but no pretrained assets are
downloadable in this environment)."""

from __future__ import annotations

import os
import re

import numpy as np

from ..utils.hashing import stable_hash64

# C fast path (native/fasthash.c tokenize_ids, parity-tested); set
# YRT_NATIVE_TOKENIZER=0 to force the pure-Python reference path
_USE_NATIVE = os.environ.get("YRT_NATIVE_TOKENIZER", "1") != "0"

_WORD_RE = re.compile(r"[A-Za-z0-9_]+|[一-鿿]|[^\sA-Za-z0-9_]")

PAD_ID = 0
CLS_ID = 1
SEP_ID = 2
_N_SPECIAL = 4


class HashTokenizer:
    """Lowercased word/CJK-char tokenization with hashed ids.

    ids: 0=pad, 1=cls, 2=sep, 3=unk(reserved), 4.. = hash buckets."""

    def __init__(self, vocab_size: int = 32768, max_length: int = 512):
        assert vocab_size > _N_SPECIAL
        self.vocab_size = vocab_size
        self.max_length = max_length

    def tokenize(self, text: str) -> list[int]:
        n_buckets = self.vocab_size - _N_SPECIAL
        if _USE_NATIVE:
            from ..native import tokenize_ids_native

            # tokens <= codepoints, so len(text) bounds the output
            ids = tokenize_ids_native(text, max(len(text), 1), n_buckets, _N_SPECIAL)
            if ids is not None:
                return ids
        words = _WORD_RE.findall(text.lower())
        return [_N_SPECIAL + (stable_hash64(w) % n_buckets) for w in words]

    def encode(self, text: str, max_length: int | None = None) -> list[int]:
        """[CLS] tokens [SEP], truncated to max_length."""
        max_length = max_length or self.max_length
        toks = self.tokenize(text)[: max_length - 2]
        return [CLS_ID] + toks + [SEP_ID]

    def encode_pair(self, a: str, b: str, max_length: int | None = None) -> list[int]:
        """[CLS] a [SEP] b [SEP] — cross-encoder reranker input."""
        max_length = max_length or self.max_length
        ta = self.tokenize(a)
        tb = self.tokenize(b)
        budget = max_length - 3
        ta = ta[: budget // 3]
        tb = tb[: budget - len(ta)]
        return [CLS_ID] + ta + [SEP_ID] + tb + [SEP_ID]

    def batch(
        self, texts: list[str], max_length: int | None = None, pad_to: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Encode + pad a batch. Returns (ids [B, T] int32, mask [B, T] f32).

        Uses the batched C tokenizer when available — one FFI call for the
        whole batch (the ingest hot path: the encoder consumes ~875k
        tokens/s on a v5e chip, well past the pure-Python tokenizer)."""
        max_length = max_length or self.max_length
        if _USE_NATIVE:
            from ..native import tokenize_ids_batch_native

            got = tokenize_ids_batch_native(
                texts, max_length - 2, self.vocab_size - _N_SPECIAL, _N_SPECIAL
            )
            if got is not None:
                toks, counts = got
                lens = counts + 2  # [CLS] ... [SEP]
                t = pad_to or int(lens.max(initial=2))
                ids = np.full((len(texts), t), PAD_ID, np.int32)
                mask = np.zeros((len(texts), t), np.float32)
                ids[:, 0] = CLS_ID
                for i, c in enumerate(counts):
                    c = int(c)
                    ids[i, 1 : 1 + c] = toks[i, :c]
                    ids[i, 1 + c] = SEP_ID
                    mask[i, : c + 2] = 1.0
                return ids, mask
        seqs = [self.encode(t, max_length) for t in texts]
        t = pad_to or max(len(s) for s in seqs)
        ids = np.full((len(seqs), t), PAD_ID, np.int32)
        mask = np.zeros((len(seqs), t), np.float32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1.0
        return ids, mask
