"""Corpus-level BM25 inverted index for hybrid retrieval.

The reference's HybridRetriever is a TODO stub that silently delegates to
dense (``utu/rag/knowledge_retrieval/base_retriever.py:102-139``); the
first TPU-build version fused dense candidates with BM25 *re-scoring of
the dense pool only*, which collapses exactly when hybrid matters most —
a weak dense encoder never admits the needle chunk into the pool, so
lexical evidence can't recover it (observed: Sequential-NIAH-style
fixture recall 0.78 with a lexical-ish dense embedder vs 0.13 with a
weak trained encoder, same fusion code).

This module is the fix: a true inverted index over the whole corpus,
maintained incrementally by :class:`~.store.TpuVectorStore` alongside
the device index. Host-side by design — term postings are pointer-chasing
IO the TPU is wrong for (SURVEY §5.8: host I/O stays on CPU); the dense
side stays on the device engine and the two fuse by RRF in
``HybridRetriever``.

Terms are hashed ids from the same tokenizer the lexical reranker uses
(native fasthash when available), so postings are int→{chunk→tf} maps
with no string keys. Deletes are exact (per-chunk unique-term lists are
retained), so BM25 df/avgdl stay consistent under the store's
delete-then-reinsert update discipline.
"""

from __future__ import annotations

from collections import Counter
from math import log
from typing import Any, Callable, Iterable

from ..core.types import Chunk
from ..models.tokenizer import HashTokenizer


class LexicalInvertedIndex:
    """Incremental BM25 index keyed by chunk id.

    Not thread-safe on its own; the owning store serializes mutations
    behind its add lock (reads are safe against the GIL-atomic dict ops
    used here, matching the device index's read model).
    """

    def __init__(self, k1: float = 1.5, b: float = 0.75):
        self.k1 = k1
        self.b = b
        self._tok = HashTokenizer(vocab_size=2**30, max_length=1 << 20)
        # term -> {chunk_id: tf}
        self._postings: dict[int, dict[str, int]] = {}
        # chunk_id -> (doc_len, unique term ids) — makes delete exact
        self._docs: dict[str, tuple[int, tuple[int, ...]]] = {}
        # document_id -> set of chunk ids (delete_by_document support)
        self._by_doc: dict[str, set[str]] = {}
        self._chunk_doc: dict[str, str] = {}
        self._total_len = 0

    # -- mutation -----------------------------------------------------------

    def add(self, chunks: list[Chunk]) -> None:
        for c in chunks:
            if c.id in self._docs:
                self._remove_one(c.id)
            toks = self._tok.tokenize(c.content or "")
            tf = Counter(toks)
            self._docs[c.id] = (len(toks), tuple(tf))
            self._total_len += len(toks)
            for t, n in tf.items():
                self._postings.setdefault(t, {})[c.id] = n
            if c.document_id:
                self._by_doc.setdefault(c.document_id, set()).add(c.id)
                self._chunk_doc[c.id] = c.document_id

    def delete(self, chunk_ids: Iterable[str]) -> int:
        n = 0
        for cid in chunk_ids:
            n += self._remove_one(cid)
        return n

    def delete_by_document(self, document_id: str) -> int:
        return self.delete(list(self._by_doc.get(document_id, ())))

    def _remove_one(self, cid: str) -> int:
        entry = self._docs.pop(cid, None)
        if entry is None:
            return 0
        doc_len, terms = entry
        self._total_len -= doc_len
        for t in terms:
            plist = self._postings.get(t)
            if plist is not None:
                plist.pop(cid, None)
                if not plist:
                    del self._postings[t]
        doc = self._chunk_doc.pop(cid, None)
        if doc is not None:
            cids = self._by_doc.get(doc)
            if cids is not None:
                cids.discard(cid)
                if not cids:
                    del self._by_doc[doc]
        return 1

    def clear(self) -> None:
        self._postings.clear()
        self._docs.clear()
        self._by_doc.clear()
        self._chunk_doc.clear()
        self._total_len = 0

    def rebuild(self, chunks: Iterable[Chunk]) -> None:
        """Full rebuild (snapshot restore path)."""
        self.clear()
        self.add(list(chunks))

    # -- search ---------------------------------------------------------------

    def __len__(self) -> int:
        return len(self._docs)

    def _score_candidates(self, query: str) -> tuple[dict[str, float], set[int]]:
        """One postings walk → BM25 scores for every chunk sharing a query
        term, plus the query's term-id set (reused by rare-term logic)."""
        n_docs = len(self._docs)
        q_terms = set(self._tok.tokenize(query))
        if n_docs == 0:
            return {}, q_terms
        avgdl = max(self._total_len / n_docs, 1.0)
        scores: dict[str, float] = {}
        for t in q_terms:
            plist = self._postings.get(t)
            if not plist:
                continue
            df = len(plist)
            idf = log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            for cid, tf in plist.items():
                dl = self._docs[cid][0]
                denom = tf + self.k1 * (1 - self.b + self.b * dl / avgdl)
                scores[cid] = scores.get(cid, 0.0) + idf * tf * (self.k1 + 1) / denom
        return scores, q_terms

    @staticmethod
    def _ranked_filter(
        ranked: list[tuple[str, float]],
        top_k: int,
        predicate: Callable[[str], bool] | None,
    ) -> list[tuple[str, float]]:
        if predicate is None:
            return ranked[:top_k]
        out = []
        for cid, s in ranked:
            if predicate(cid):
                out.append((cid, s))
                if len(out) >= top_k:
                    break
        return out

    def search(
        self,
        query: str,
        top_k: int = 10,
        predicate: Callable[[str], bool] | None = None,
    ) -> list[tuple[str, float]]:
        """BM25 over the union of query-term postings.

        ``predicate(chunk_id)`` applies metadata filters *after* scoring:
        candidates are walked in score order until ``top_k`` pass, so the
        cost is O(candidate postings) + O(passed · predicate), not a
        corpus scan.
        """
        scores, _ = self._score_candidates(query)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return self._ranked_filter(ranked, top_k, predicate)

    def search_bundle(
        self,
        query: str,
        top_k: int = 10,
        predicate: Callable[[str], bool] | None = None,
        rare_max_df: int = 3,
        rare_limit: int = 8,
    ) -> tuple[list[tuple[str, float]], dict[str, float], list[tuple[str, float]]]:
        """Everything the hybrid retriever needs from ONE tokenize + ONE
        postings walk: (top-k hits, full candidate score map, rare-term
        matches). The score map gives dense-pool candidates their lexical
        credit without re-scoring; rare matches reuse the same scores."""
        scores, q_terms = self._score_candidates(query)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        hits = self._ranked_filter(ranked, top_k, predicate)
        rare_cids: set[str] = set()
        for t in q_terms:
            plist = self._postings.get(t)
            if plist and len(plist) <= rare_max_df:
                rare_cids.update(plist)
        rare = self._ranked_filter(
            sorted(
                ((cid, scores[cid]) for cid in rare_cids),
                key=lambda kv: (-kv[1], kv[0]),
            ),
            rare_limit,
            predicate,
        )
        return hits, scores, rare

    def score_chunks(self, query: str, chunk_ids: Iterable[str]) -> dict[str, float]:
        """BM25 scores for specific chunks using *corpus* statistics.

        Lets the hybrid retriever give dense-pool candidates the same
        lexical credit as corpus-sourced candidates (one consistent
        ranking over the union, rather than two lists with different df
        normalization)."""
        n_docs = len(self._docs)
        if n_docs == 0:
            return {}
        q_terms = set(self._tok.tokenize(query))
        avgdl = max(self._total_len / n_docs, 1.0)
        out: dict[str, float] = {}
        for cid in chunk_ids:
            entry = self._docs.get(cid)
            if entry is None:
                continue
            dl = entry[0]
            s = 0.0
            for t in q_terms:
                plist = self._postings.get(t)
                if not plist:
                    continue
                tf = plist.get(cid)
                if not tf:
                    continue
                df = len(plist)
                idf = log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                denom = tf + self.k1 * (1 - self.b + self.b * dl / avgdl)
                s += idf * tf * (self.k1 + 1) / denom
            out[cid] = s
        return out

    def rare_term_matches(
        self, query: str, max_df: int = 3, limit: int = 8
    ) -> list[tuple[str, float]]:
        """Chunks matching a near-unique query term (df ≤ ``max_df``),
        ordered by full BM25 score.

        The exact-identifier signal: when a query names a rare token
        (an ID, a code, a product name), the handful of chunks that
        contain it are almost certainly what the user means — the hybrid
        retriever reserves result slots for them so dense-ranking noise
        can never push an exact match out of the top-k."""
        rare_cids: set[str] = set()
        for t in set(self._tok.tokenize(query)):
            plist = self._postings.get(t)
            if plist and len(plist) <= max_df:
                rare_cids.update(plist)
        if not rare_cids:
            return []
        scored = self.score_chunks(query, rare_cids)
        return sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]

    def stats(self) -> dict[str, Any]:
        return {
            "documents": len(self._docs),
            "terms": len(self._postings),
            "total_tokens": self._total_len,
        }
