"""Rerankers + factory (replaces ``utu/rag/rerankers/`` which POSTs to
Jina-style ``/rerank`` endpoints, ``openai_reranker.py:20-214``).

- ``TpuReranker``     — on-device cross-encoder: query/doc pairs through the
  shared encoder trunk, CLS → scalar head, batched under jit;
- ``LexicalReranker`` — deterministic BM25-ish token-overlap scorer (host);
  hermetic default for tests and a useful hybrid signal;
- ``RemoteReranker``  — HTTP adapter kept for parity with the reference's
  service-based deployment option (``rerankers/factory.py:15-216``).

All honor the reference contract: return results re-scored and re-ranked,
``top_k=None`` keeps all (``utu/rag/base.py:131-155``)."""

from __future__ import annotations

import math
import os
from collections import Counter

import numpy as np

from ..core.config import RerankerConfig
from ..core.types import BaseReranker, RetrievalResult
from ..utils.http import post_json_with_retry
from ..utils.log import get_logger
from .tokenizer import HashTokenizer

logger = get_logger("models.reranker")


def _reranked(results: list[RetrievalResult], scores: list[float], top_k: int | None):
    order = sorted(range(len(results)), key=lambda i: -scores[i])
    if top_k is not None:
        order = order[:top_k]
    out = []
    for rank, i in enumerate(order):
        r = results[i]
        out.append(RetrievalResult(chunk=r.chunk, score=float(scores[i]), rank=rank + 1))
    return out


class LexicalReranker(BaseReranker):
    """BM25-style query-term scoring over the candidate set."""

    def __init__(self, k1: float = 1.5, b: float = 0.75):
        self.k1, self.b = k1, b
        self._tok = HashTokenizer(vocab_size=2**30, max_length=8192)

    def score(self, query: str, docs: list[str]) -> list[float]:
        q_terms = set(self._tok.tokenize(query))
        doc_tokens = [self._tok.tokenize(d) for d in docs]
        n = len(docs)
        avgdl = max(sum(len(t) for t in doc_tokens) / max(n, 1), 1.0)
        df = Counter()
        for toks in doc_tokens:
            df.update(set(toks) & q_terms)
        scores = []
        for toks in doc_tokens:
            tf = Counter(toks)
            s = 0.0
            for t in q_terms:
                if tf[t] == 0:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                denom = tf[t] + self.k1 * (1 - self.b + self.b * len(toks) / avgdl)
                s += idf * tf[t] * (self.k1 + 1) / denom
            scores.append(s)
        return scores

    async def rerank(self, query, results, top_k=None):
        if not results:
            return []
        scores = self.score(query, [r.chunk.content for r in results])
        return _reranked(results, scores, top_k)


class TpuReranker(BaseReranker):
    """Cross-encoder forward on TPU; pairs padded to pow2 buckets."""

    def __init__(
        self,
        config=None,
        params: dict | None = None,
        batch_size: int = 64,
        seed: int = 0,
        tokenizer=None,
    ):
        import jax

        from .encoder import EncoderConfig, init_encoder_params, rerank_scores

        self.cfg = config or EncoderConfig()
        self.params = params if params is not None else init_encoder_params(self.cfg, seed)
        self.tokenizer = tokenizer or HashTokenizer(self.cfg.vocab_size, self.cfg.max_len)
        self.batch_size = batch_size
        self._fwd = jax.jit(
            lambda p, ids, m, tt: rerank_scores(p, ids, m, self.cfg, type_ids=tt)
        )

    @classmethod
    def from_pretrained(cls, model_dir, dtype=None, attention_impl: str | None = None,
                        max_len: int | None = None, **kwargs) -> "TpuReranker":
        """Serve a pretrained BERT-family cross-encoder (bge-reranker-style
        BertForSequenceClassification export) on TPU — the quality slot of
        the reference's Jina-style /rerank service
        (``openai_reranker.py:20-214``)."""
        from .pretrained import load_pretrained_encoder

        params, cfg, tokenizer = load_pretrained_encoder(
            model_dir, dtype=dtype, attention_impl=attention_impl, max_len=max_len
        )
        if "score_head" not in params:
            raise ValueError(
                f"{model_dir} has no classifier head — an embedding model, "
                "not a reranker checkpoint?"
            )
        return cls(config=cfg, params=params, tokenizer=tokenizer, **kwargs)

    def score(self, query: str, docs: list[str]) -> list[float]:
        scores: list[float] = []
        for i in range(0, len(docs), self.batch_size):
            batch = docs[i : i + self.batch_size]
            seqs = [self.tokenizer.encode_pair(query, d) for d in batch]
            t = 16
            while t < max(len(s) for s in seqs):
                t *= 2
            t = min(t, self.cfg.max_len)
            nb = 8
            while nb < len(batch):
                nb *= 2
            ids = np.zeros((nb, t), np.int32)
            mask = np.zeros((nb, t), np.float32)
            types = np.zeros((nb, t), np.int32)
            sep = getattr(self.tokenizer, "sep_id", None)
            for j, s in enumerate(seqs):
                s = s[:t]
                ids[j, : len(s)] = s
                mask[j, : len(s)] = 1.0
                if sep is not None and sep in s:
                    # segment 1 after the first [SEP] (bert token types)
                    types[j, s.index(sep) + 1 : len(s)] = 1
            out = np.asarray(self._fwd(self.params, ids, mask, types))
            scores.extend(out[: len(batch)].tolist())
        return scores

    async def rerank(self, query, results, top_k=None):
        if not results:
            return []
        scores = self.score(query, [r.chunk.content for r in results])
        return _reranked(results, scores, top_k)


class RemoteReranker(BaseReranker):
    """Jina-style ``POST /rerank`` adapter (ref: openai_reranker.py:67-214).

    ``top_field`` handles vendor dialects: Jina/OpenAI-style services take
    ``top_n`` while TIONE takes ``top_k`` (ref tione_reranker.py:81-88) —
    both return ``{"results": [{"index", "relevance_score"}]}``."""

    def __init__(self, config: RerankerConfig, top_field: str = "top_n"):
        self.config = config
        self.top_field = top_field

    async def rerank(self, query, results, top_k=None):
        if not results:
            return []
        headers = {}
        if self.config.api_key:
            headers["Authorization"] = f"Bearer {self.config.api_key}"
        payload = {
            "model": self.config.model,
            "query": query,
            "documents": [r.chunk.content for r in results],
            self.top_field: top_k or len(results),
        }
        data = await post_json_with_retry(
            self.config.base_url.rstrip("/") + "/rerank", payload, headers=headers, log=logger
        )
        scores = [0.0] * len(results)
        for item in data.get("results", []):
            idx = item.get("index")
            # remote responses are untrusted: an out-of-range index must
            # not crash the rerank (or mis-assign via negative indexing)
            if isinstance(idx, int) and 0 <= idx < len(results):
                scores[idx] = item.get("relevance_score", 0.0)
            else:
                logger.warning("reranker returned invalid index %r; ignored", idx)
        return _reranked(results, scores, top_k)


class RerankerFactory:
    """Provider dispatch (ref: rerankers/factory.py:15-216)."""

    @staticmethod
    def create(config: RerankerConfig | None = None, **kwargs) -> BaseReranker | None:
        config = config or RerankerConfig()
        p = config.provider
        if p == "none":
            return None
        if p == "lexical":
            return LexicalReranker()
        if p == "tpu":
            return TpuReranker(**kwargs)
        if p in ("openai", "service", "jina", "tione"):
            # env fallbacks apply INDEPENDENTLY: a configured base_url
            # with a secret passed via env must still send the key
            config = config.model_copy(
                update={
                    "base_url": config.base_url
                    or os.environ.get("YRT_RERANKER_URL")
                    or os.environ.get("UTU_RERANKER_URL"),
                    "api_key": config.api_key
                    or os.environ.get("YRT_RERANKER_API_KEY")
                    or os.environ.get("UTU_RERANKER_API_KEY"),
                }
            )
            if not config.base_url:
                raise ValueError(
                    f"reranker provider {p!r} needs base_url (config) or "
                    "YRT_RERANKER_URL / UTU_RERANKER_URL in the environment"
                )
            return RemoteReranker(config, top_field="top_k" if p == "tione" else "top_n")
        raise ValueError(f"unknown reranker provider {p!r}")
