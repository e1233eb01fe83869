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

Storage is **array-backed** (round 4; was dict-of-dicts at ~8 KB host RAM
per chunk): per-term postings are growable int32 (row, tf) arrays, chunk
ids live once in a row table, deletes tombstone rows in a live bitmap
(postings prune lazily when a term's dead fraction passes 1/2 — the same
tombstone-then-compact discipline as the device index), and BM25
accumulates with vectorized numpy over the postings arrays — the
"native" scoring path without a bespoke C kernel, because numpy already
is the C loop. Measured on 50k × 120-token chunks: 3.3 KB/chunk host
RAM (was ~8 KB) and 1.5–2.1 ms/query including ranking (was ~7 ms
worst-case), identical rankings (hypothesis mutation/property tests;
the no-predicate top-k keeps boundary ties exact via a partition+margin
pass). Build ~1.6k chunks/s/core.

Terms are hashed ids from the same tokenizer the lexical reranker uses
(native fasthash when available). Deletes are exact (per-chunk unique-
term lists are retained), so BM25 df/avgdl stay consistent under the
store's delete-then-reinsert update discipline.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Mapping
from math import log
from typing import Any, Callable, Iterable

import numpy as np

from ..core.types import Chunk
from ..models.tokenizer import HashTokenizer


class _RowScoreMap(Mapping):
    """Lazy {chunk_id: score} view over the dense row-score array.

    The hybrid retriever only probes ``.get`` for its dense-pool
    candidates; materializing a real dict of every lexical candidate per
    query was the bundle path's dominant cost after vectorized scoring."""

    __slots__ = ("_scores", "_row_of", "_cand", "_cid_of")

    def __init__(self, scores, row_of, cand, cid_of):
        self._scores = scores
        self._row_of = row_of
        self._cand = cand
        self._cid_of = cid_of

    def get(self, cid, default=0.0):
        row = self._row_of.get(cid)
        if row is None:
            return default
        s = float(self._scores[row])
        return s if s != 0.0 else default

    def __getitem__(self, cid):
        row = self._row_of.get(cid)
        if row is None:
            raise KeyError(cid)
        s = float(self._scores[row])
        if s == 0.0:
            raise KeyError(cid)
        return s

    def __iter__(self):
        return (self._cid_of[r] for r in self._cand)

    def __len__(self):
        return int(self._cand.size)


class _Posting:
    """Growable (row, tf) arrays for one term. ``n`` is the used length;
    ``dead`` counts tombstoned entries awaiting a lazy prune."""

    __slots__ = ("rows", "tfs", "n", "dead")

    def __init__(self):
        self.rows = np.empty(4, np.int32)
        self.tfs = np.empty(4, np.int32)
        self.n = 0
        self.dead = 0

    def append(self, row: int, tf: int) -> None:
        if self.n == len(self.rows):
            cap = max(len(self.rows) * 2, 8)
            self.rows = np.resize(self.rows, cap)
            self.tfs = np.resize(self.tfs, cap)
        self.rows[self.n] = row
        self.tfs[self.n] = tf
        self.n += 1

    def live(self, live_mask: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        rows = self.rows[: self.n]
        alive = live_mask[rows]
        return rows[alive], self.tfs[: self.n][alive]

    def prune(self, live_mask: np.ndarray) -> None:
        rows, tfs = self.live(live_mask)
        self.n = rows.size
        self.dead = 0
        cap = max(self.n, 4)
        self.rows = np.resize(rows, cap)
        self.tfs = np.resize(tfs, cap)

    @property
    def df(self) -> int:
        return self.n - self.dead


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
        self._postings: dict[int, _Posting] = {}
        # row tables: chunk id ↔ int row; dead rows stay None until compact
        self._cid_of: list[str | None] = []
        self._row_of: dict[str, int] = {}
        self._doc_len = np.zeros(16, np.int32)
        self._live = np.zeros(16, np.bool_)
        # per-row unique-term id arrays — exact deletes (df bookkeeping)
        self._terms_of: list[np.ndarray | None] = []
        self._by_doc: dict[str, set[str]] = {}
        self._chunk_doc: dict[str, str] = {}
        self._n_live = 0
        self._total_len = 0

    # -- row table ----------------------------------------------------------

    def _alloc_row(self, cid: str) -> int:
        # rows are MONOTONE — a freed slot must never be reused while stale
        # postings entries can still reference it (they are tombstoned only
        # through the live bitmap, so a reused row would resurrect them).
        # Dead slots reclaim in _compact(), the device-index discipline.
        row = len(self._cid_of)
        self._cid_of.append(cid)
        self._terms_of.append(None)
        if row >= len(self._doc_len):
            cap = max(len(self._doc_len) * 2, 16)
            self._doc_len = np.resize(self._doc_len, cap)
            self._live = np.resize(self._live, cap)
            self._live[row:] = False
        self._row_of[cid] = row
        return row

    # -- mutation -----------------------------------------------------------

    def add(self, chunks: list[Chunk]) -> None:
        for c in chunks:
            if c.id in self._row_of:
                self._remove_one(c.id)
            toks = self._tok.tokenize(c.content or "")
            tf = Counter(toks)
            row = self._alloc_row(c.id)
            self._doc_len[row] = len(toks)
            self._live[row] = True
            # np array, not a tuple: python int objects aren't interned at
            # hashed-id magnitude, so tuples cost ~36 B/term — the dominant
            # RAM term at corpus scale (measured 7.0 → 2.7 KB/chunk)
            self._terms_of[row] = np.fromiter(tf.keys(), np.int64, len(tf))
            self._n_live += 1
            self._total_len += len(toks)
            for t, n in tf.items():
                p = self._postings.get(t)
                if p is None:
                    p = self._postings[t] = _Posting()
                p.append(row, n)
            if c.document_id:
                self._by_doc.setdefault(c.document_id, set()).add(c.id)
                self._chunk_doc[c.id] = c.document_id

    def delete(self, chunk_ids: Iterable[str]) -> int:
        n = 0
        for cid in list(chunk_ids):
            n += self._remove_one(cid)
        return n

    def delete_by_document(self, document_id: str) -> int:
        return self.delete(list(self._by_doc.get(document_id, ())))

    def _remove_one(self, cid: str) -> int:
        row = self._row_of.pop(cid, None)
        if row is None:
            return 0
        self._total_len -= int(self._doc_len[row])
        self._live[row] = False
        self._n_live -= 1
        terms = self._terms_of[row]
        for t in (() if terms is None else terms.tolist()):
            p = self._postings.get(t)
            if p is None:
                continue
            p.dead += 1
            if p.df <= 0:
                del self._postings[t]
            elif p.dead * 2 > p.n:
                p.prune(self._live)
        self._terms_of[row] = None
        self._cid_of[row] = None
        doc = self._chunk_doc.pop(cid, None)
        if doc is not None:
            cids = self._by_doc.get(doc)
            if cids is not None:
                cids.discard(cid)
                if not cids:
                    del self._by_doc[doc]
        if len(self._cid_of) > 1024 and len(self._cid_of) > 2 * self._n_live:
            self._compact()
        return 1

    def _compact(self) -> None:
        """Reclaim dead row slots: renumber live rows densely and remap
        every posting (full O(index) pass, amortized by the 2× trigger)."""
        n_old = len(self._cid_of)
        old_live = self._live[:n_old].copy()
        live_rows = np.flatnonzero(old_live).astype(np.int32)
        remap = np.full(n_old, -1, np.int32)
        remap[live_rows] = np.arange(live_rows.size, dtype=np.int32)
        self._cid_of = [self._cid_of[r] for r in live_rows]
        self._terms_of = [self._terms_of[r] for r in live_rows]
        cap = max(live_rows.size, 16)
        self._doc_len = np.resize(self._doc_len[live_rows], cap)
        new_live = np.zeros(cap, np.bool_)
        new_live[: live_rows.size] = True
        self._live = new_live
        self._row_of = {cid: i for i, cid in enumerate(self._cid_of)}
        for t in list(self._postings):
            p = self._postings[t]
            rows = p.rows[: p.n]
            alive = old_live[rows]
            rows = remap[rows[alive]]
            tfs = p.tfs[: p.n][alive]
            if rows.size == 0:
                del self._postings[t]
                continue
            p.n = rows.size
            p.dead = 0
            c = max(p.n, 4)
            p.rows = np.resize(rows, c)
            p.tfs = np.resize(tfs, c)

    def clear(self) -> None:
        self.__init__(self.k1, self.b)

    def rebuild(self, chunks: Iterable[Chunk]) -> None:
        """Full rebuild (snapshot restore path)."""
        self.clear()
        self.add(list(chunks))

    # -- search ---------------------------------------------------------------

    def __len__(self) -> int:
        return self._n_live

    def _score_rows(self, query: str) -> tuple[np.ndarray, np.ndarray, set[int]]:
        """One vectorized postings walk → (dense row-score array, candidate
        rows, query term-id set). BM25 accumulates per term with numpy —
        the C loop without a C kernel."""
        q_terms = set(self._tok.tokenize(query))
        n_docs = self._n_live
        n_rows = len(self._cid_of)
        scores = np.zeros(n_rows, np.float64)
        if n_docs == 0 or not q_terms:
            return scores, np.empty(0, np.int32), q_terms
        avgdl = max(self._total_len / n_docs, 1.0)
        touched: list[np.ndarray] = []
        for t in q_terms:
            p = self._postings.get(t)
            if p is None:
                continue
            rows, tfs = p.live(self._live)
            if rows.size == 0:
                continue
            df = rows.size
            idf = log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            dl = self._doc_len[rows].astype(np.float64)
            tff = tfs.astype(np.float64)
            denom = tff + self.k1 * (1.0 - self.b + self.b * dl / avgdl)
            np.add.at(scores, rows, idf * tff * (self.k1 + 1.0) / denom)
            touched.append(rows)
        cand = (
            np.unique(np.concatenate(touched)) if touched else np.empty(0, np.int32)
        )
        return scores, cand, q_terms

    def _score_candidates(self, query: str) -> tuple[dict[str, float], set[int]]:
        """Compatibility shape: {chunk_id: score} for every chunk sharing a
        query term, plus the query's term-id set."""
        scores, cand, q_terms = self._score_rows(query)
        return {self._cid_of[r]: float(scores[r]) for r in cand}, q_terms

    def _rank(
        self,
        row_scores: np.ndarray,
        cand: np.ndarray,
        top_k: int,
        predicate: Callable[[str], bool] | None,
    ) -> list[tuple[str, float]]:
        """Exact (score desc, cid) top-k. With no predicate, a partition
        pass shrinks the python sort to ~top_k candidates (ties at the
        boundary kept, so the order is identical to a full sort)."""
        if cand.size == 0 or top_k <= 0:
            return []
        sel = cand
        if predicate is None and cand.size > 4 * top_k:
            s = row_scores[cand]
            kth = np.partition(s, cand.size - top_k)[cand.size - top_k]
            sel = cand[s >= kth]
        pairs = [(self._cid_of[r], float(row_scores[r])) for r in sel]
        pairs.sort(key=lambda kv: (-kv[1], kv[0]))
        return self._ranked_filter(pairs, top_k, predicate)

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
        row_scores, cand, _ = self._score_rows(query)
        return self._rank(row_scores, cand, top_k, predicate)

    def search_bundle(
        self,
        query: str,
        top_k: int = 10,
        predicate: Callable[[str], bool] | None = None,
        rare_max_df: int = 3,
        rare_limit: int = 8,
    ) -> tuple[list[tuple[str, float]], Mapping, list[tuple[str, float]]]:
        """Everything the hybrid retriever needs from ONE tokenize + ONE
        postings walk: (top-k hits, full candidate score map, rare-term
        matches). The score map gives dense-pool candidates their lexical
        credit without re-scoring; rare matches reuse the same scores."""
        row_scores, cand, q_terms = self._score_rows(query)
        scores = _RowScoreMap(row_scores, self._row_of, cand, self._cid_of)
        hits = self._rank(row_scores, cand, top_k, predicate)
        rare_cids: set[str] = set()
        for t in q_terms:
            p = self._postings.get(t)
            if p is None:
                continue
            rows, _tfs = p.live(self._live)
            if 0 < rows.size <= rare_max_df:
                rare_cids.update(self._cid_of[r] for r in rows)
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
        normalization). Scoring reuses the vectorized walk and reads the
        wanted rows off the dense score array."""
        wanted = [cid for cid in chunk_ids if cid in self._row_of]
        if not wanted or self._n_live == 0:
            return {}
        row_scores, _, _ = self._score_rows(query)
        return {cid: float(row_scores[self._row_of[cid]]) for cid in wanted}

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
            p = self._postings.get(t)
            if p is None:
                continue
            rows, _tfs = p.live(self._live)
            if 0 < rows.size <= max_df:
                rare_cids.update(self._cid_of[r] for r in rows)
        if not rare_cids:
            return []
        scored = self.score_chunks(query, rare_cids)
        return sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]

    def stats(self) -> dict[str, Any]:
        return {
            "documents": self._n_live,
            "terms": len(self._postings),
            "total_tokens": self._total_len,
        }
