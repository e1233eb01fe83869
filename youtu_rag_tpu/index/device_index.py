"""Device-resident vector index — the TPU-native replacement for the
reference's Chroma/FAISS stores (``chroma_store.py:22-398``,
``faiss_store.py:24-303``).

Design (TPU-first, not a port):
- vectors live in a device array ``[capacity, d_pad]`` (bf16 by default),
  L2-normalized at insert for cosine so score == inner product on the MXU;
- liveness and the L2-norm correction are *additive float32 biases* fused
  into the score (no boolean gathers, no dynamic shapes):
    live_bias: 0 for live rows, NEG_INF for tombstones/padding — this is
    the delete semantics Chroma implements by segment GC
    (``chroma_store.py:162-183``) and FAISS cannot implement at all
    (``faiss_store.py:201-229``);
    norm_bias: -||x||^2 for the l2 metric so 2 q·x + norm_bias is
    monotonic in negative squared distance;
- metadata filters compile to a device mask over int32 columns
  (``youtu_rag_tpu.index.filters``) and join the bias, so filtering is
  fused mask-and-score rather than Chroma's pre-filtered candidate lists;
- capacity grows by powers of two; batch appends are padded to power-of-two
  bucket sizes — both keep jit cache keys finite;
- chunk contents/metadata stay host-side (row ↔ chunk id maps), only the
  math lives on device.

``search`` semantics parity: returns (chunk, similarity) sorted descending,
cosine similarity in [-1, 1] matching ``1 - cosine_distance``
(``chroma_store.py:132-135``); l2 returns negative squared distance;
ip returns the raw inner product.
"""

from __future__ import annotations

import functools
import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import IndexConfig
from ..core.types import Chunk
from ..ops.topk import (
    NEG_INF,
    pallas_topk_int4_pruned,
    pallas_topk_int8_pruned,
    pallas_topk_pruned,
    unpack_int4,
    xla_topk,
    xla_topk_int4,
    xla_topk_int8,
)
from ..utils.log import get_logger
from .filters import CompiledFilter, FilterError, compile_filter, host_eval
from .metadata import MetadataSchema

logger = get_logger("index.device")

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pow2_at_least(x: int, floor: int) -> int:
    c = max(floor, 1)
    while c < x:
        c *= 2
    return c


class DeviceVectorIndex:
    """Single-device (or single-shard) vector index.

    Thread-safe for interleaved add/delete/search (one internal lock around
    mutations; searches snapshot array references)."""

    def __init__(self, dim: int, config: IndexConfig | None = None, device: jax.Device | None = None):
        from ..utils.jax_cache import enable_compile_cache

        enable_compile_cache()
        self.config = config or IndexConfig()
        self.dim = dim
        self._device = device
        self._lock = threading.RLock()
        self._reset()

    def _reset(self) -> None:
        """(Re)initialize all index state in place.

        Never touches ``self._lock``: clear()/compact() run under the lock,
        and swapping the lock object mid-hold would let threads blocked on
        the old lock race threads acquiring the new one (with donated device
        buffers in _append_kernel that corrupts concurrent add/search)."""
        self.metric = self.config.metric
        self._int8 = self.config.storage_dtype == "int8"
        self._int4 = self.config.storage_dtype == "int4"
        # int4 packs two columns per byte, so the PACKED width (d_pad/2)
        # must stay lane-aligned — pad to 2 lanes (e.g. dim 384 → d_pad
        # 512, packed 256; plain 128-rounding would give packed 192 and
        # trip the kernel's lane assert on TPU)
        self.d_pad = _round_up(self.dim, 2 * _LANE if self._int4 else _LANE)
        # both quantized lanes store int8 bytes + f32 per-row scales; int4
        # packs two columns per byte so its vector array is half as wide
        self._quant = self._int8 or self._int4
        self._store_dtype = {
            "bfloat16": jnp.bfloat16,
            "float32": jnp.float32,
            "int8": jnp.int8,  # symmetric per-row quantization + f32 scales
            "int4": jnp.int8,  # packed nibbles (ops.topk.quantize_rows_int4)
        }[self.config.storage_dtype]

        self.capacity = _pow2_at_least(self.config.min_capacity, self.config.block_rows)
        self.size = 0  # rows ever appended (including tombstones)
        self.live_count = 0

        self.schema = MetadataSchema(max_columns=self.config.max_metadata_columns)

        self._vec_cols = self.d_pad // 2 if self._int4 else self.d_pad
        self._vectors = self._zeros((self.capacity, self._vec_cols), self._store_dtype)
        self._scales = self._zeros((self.capacity,), jnp.float32) if self._quant else None
        # int4 two-stage search: int8 shadow copy in HOST RAM for exact-ish
        # re-rank of the device candidates (ScaNN-style; d bytes/row of
        # host memory, zero HBM). See IndexConfig.int4_rerank_multiplier.
        self._host_rerank = self._int4 and self.config.int4_rerank_multiplier > 1
        self._host_q8 = (
            np.zeros((self.capacity, self.d_pad), np.int8) if self._host_rerank else None
        )
        self._host_s8 = (
            np.zeros(self.capacity, np.float32) if self._host_rerank else None
        )
        self._cols = self._full((self.capacity, self.schema.max_columns), -(2**31), jnp.int32)
        self._bias = self._full((self.capacity,), NEG_INF, jnp.float32)  # live+norm bias

        # host-side
        self._chunks: list[Chunk | None] = []
        self._id_to_row: dict[str, int] = {}
        self._doc_rows: dict[str, list[int]] = {}
        # signature → canonical CompiledFilter instance. jit hashes static
        # args by identity, so equal-signature filters must share one object
        # to share one compiled executable (constants stay traced).
        self._filter_cache: dict[str, CompiledFilter] = {}
        self._ivf = None  # IVFState after build_ivf()
        # next-tier warming: AOT-compile the search kernel at the *next*
        # capacity in the background once the index passes 75% full, so the
        # recompile at growth time is a persistent-cache hit instead of a
        # 20-40s stall (ROADMAP "capacity-growth stalls")
        self._seen_sigs: set[tuple] = set()  # (q_rows, k, backend)
        self._seen_buckets: set[int] = set()  # append bucket sizes seen
        # (capacity, item) pairs whose executables are compiled (or being
        # compiled by the background warmer); items are ("sig", sig) /
        # ("bucket", n)
        self._warmed: set[tuple] = set()
        self._warm_stats = {"tiers": 0, "kernels": 0}
        # closed-loop nprobe tuner state (IndexConfig.ivf_recall_target)
        self._ivf_tune_counter = 0
        self._ivf_recall_est: float | None = None
        self._ivf_tune_streak = 0  # consecutive comfortable observations

    # -- device helpers ----------------------------------------------------

    def _put(self, x):
        return jax.device_put(x, self._device) if self._device else jnp.asarray(x)

    def _zeros(self, shape, dtype):
        return self._put(jnp.zeros(shape, dtype))

    def _full(self, shape, val, dtype):
        return self._put(jnp.full(shape, val, dtype))

    # -- mutation ----------------------------------------------------------

    def _grow(self, need_rows: int) -> None:
        new_cap = self.capacity
        while new_cap < need_rows:
            new_cap *= 2
        if new_cap == self.capacity:
            return
        logger.info("index grow %d -> %d rows", self.capacity, new_cap)
        pad = new_cap - self.capacity
        self._vectors = jnp.concatenate(
            [self._vectors, self._zeros((pad, self._vec_cols), self._store_dtype)]
        )
        if self._quant:
            self._scales = jnp.concatenate([self._scales, self._zeros((pad,), jnp.float32)])
        if self._host_q8 is not None:
            self._host_q8 = np.concatenate(
                [self._host_q8, np.zeros((pad, self.d_pad), np.int8)]
            )
            self._host_s8 = np.concatenate([self._host_s8, np.zeros(pad, np.float32)])
        self._cols = jnp.concatenate([self._cols, self._full((pad, self.schema.max_columns), -(2**31), jnp.int32)])
        self._bias = jnp.concatenate([self._bias, self._full((pad,), NEG_INF, jnp.float32)])
        self.capacity = new_cap

    def reserve(self, total_rows: int) -> None:
        """Pre-allocate capacity for a known build size so appends during
        serving never hit the growth stall (reallocation + recompile at a
        new capacity; observed as p95 spikes in bench_streaming)."""
        with self._lock:
            self._grow(total_rows)

    # -- next-tier warming ---------------------------------------------------

    def _maybe_warm_next_tier(self) -> None:
        """Called under the lock after an append OR a new search signature.
        When the index crosses 75% full, AOT-lower+compile the brute search
        + append kernels at double capacity in a daemon thread. The
        compiled executables are discarded — the point is populating the
        in-process jit cache and the persistent XLA compile cache (utils/
        jax_cache) so the growth-time jit is a hit. IVF-path shapes depend
        on the probe plan, so only the brute kernels warm. Signatures seen
        AFTER a tier was first warmed still warm (each (tier, item) pair
        tracks independently)."""
        if self.size * 4 < self.capacity * 3:
            return
        self._schedule_warm(self.capacity * 2)

    def _schedule_warm(self, cap: int) -> None:
        items = [("sig", s) for s in self._seen_sigs] + [
            ("bucket", b) for b in self._seen_buckets
        ]
        todo = [it for it in items if (cap, it) not in self._warmed]
        if not todo:
            return
        self._warmed.update((cap, it) for it in todo)
        threading.Thread(
            target=self._warm_tier, args=(cap, todo), daemon=True,
            name=f"yrt-warm-{cap}",
        ).start()

    def ensure_tier_ready(self, cap: int) -> None:
        """Synchronously compile this index's known kernel shapes at
        capacity ``cap`` (no lock held — call BEFORE growing). ``add``
        calls this when a batch will trigger growth, so the post-growth
        executables exist before the swap and no query ever waits on a
        compile (cold-cache compiles of the big pruned kernel run minutes
        through a remote-compile tunnel; they belong on the writer).

        Two layers: AOT lower+compile fills the persistent disk cache;
        then (memory permitting) a dummy-array dispatch of the REAL jit
        functions fills the in-process jit cache, so the first
        post-growth search is a pure cache hit rather than a disk
        deserialize under the index lock."""
        with self._lock:  # snapshot: queries add sigs concurrently
            items = [("sig", s) for s in self._seen_sigs] + [
                ("bucket", b) for b in self._seen_buckets
            ]
        self._warm_tier(cap, items, quiet=True)
        self._jit_warm(cap)

    def _warm_memory_ok(self, cap: int) -> bool:
        """Can a dummy index copy at ``cap`` rows coexist with the live
        arrays? (The growth concat itself needs the same headroom, so
        passing this gate does not add to the growth peak.)"""
        dev = self._device
        if dev is None:
            try:
                dev = jax.devices()[0]
            except Exception:  # noqa: BLE001 - no backend
                return False
        itemsize = 1 if self._quant else (2 if self._store_dtype == jnp.bfloat16 else 4)
        need = cap * (self._vec_cols * itemsize + self.schema.max_columns * 4 + 8)
        try:
            stats = dev.memory_stats() or {}
        except Exception:  # noqa: BLE001 - PJRT plugins may raise
            stats = {}
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use")
        if not limit and dev.platform == "tpu":
            import os as _os

            try:
                limit = int(_os.environ.get("YRT_HBM_BYTES", 16 * 1024**3))
            except ValueError:
                limit = 16 * 1024**3
        if not limit:
            return True  # CPU tests: allocator is host RAM
        if in_use is not None:
            return 1.2 * need < limit - in_use
        return 1.2 * (need + self.nbytes()) < limit

    def _jit_warm(self, cap: int) -> None:
        """Dispatch the search/append jit functions once with dummy
        arrays at capacity ``cap`` (compile happens at dispatch; the
        result is discarded). Never raises — warming is an optimization."""
        try:
            if not self._warm_memory_ok(cap):
                logger.info("jit warm skipped at %d rows (memory headroom)", cap)
                return
            v = self._put(jnp.zeros((cap, self._vec_cols), self._store_dtype))
            b = self._put(jnp.full((cap,), NEG_INF, jnp.float32))
            sc = self._put(jnp.zeros((cap,), jnp.float32)) if self._quant else None
            with self._lock:
                sigs = list(self._seen_sigs)
                buckets = list(self._seen_buckets)
            for qn, k, raw_backend in sigs:
                backend = self._backend(raw_backend, cap=cap)
                if backend == "pallas_interpret":
                    continue
                q = jnp.zeros((qn, self.d_pad), jnp.float32)
                br = self._kernel_block_rows(int8=self._quant, rows=cap)
                if self._int4:
                    if backend == "pallas":
                        pallas_topk_int4_pruned(q, v, sc, b, k, block_rows=br)
                    else:
                        xla_topk_int4(q, v, sc, b, k)
                elif self._int8:
                    if backend == "pallas":
                        pallas_topk_int8_pruned(q, v, sc, b, k, block_rows=br)
                    else:
                        xla_topk_int8(q, v, sc, b, k)
                else:
                    _search_plain(q, v, b, k, backend, br)
            c = self._put(
                jnp.full((cap, self.schema.max_columns), -(2**31), jnp.int32)
            )
            for bucket in buckets:
                nv = self._put(jnp.zeros((bucket, self._vec_cols), self._store_dtype))
                nc = self._put(
                    jnp.full((bucket, self.schema.max_columns), -(2**31), jnp.int32)
                )
                nb = self._put(jnp.full((bucket,), NEG_INF, jnp.float32))
                # donation consumes the dummies; reuse the outputs for the
                # next bucket so one allocation serves all warms
                v, c, b = _append_kernel(v, c, b, nv, nc, nb, jnp.int32(0))
                if self._quant:
                    sc = _append_scales_kernel(
                        sc, self._put(jnp.zeros((bucket,), jnp.float32)), jnp.int32(0)
                    )
        except Exception:  # noqa: BLE001 - warming must never break ingest
            logger.exception("jit warm failed at capacity %d", cap)

    def _warm_tier(self, cap: int, items: list[tuple], quiet: bool = False) -> None:
        try:
            S = jax.ShapeDtypeStruct
            ncols = self.schema.max_columns
            for kind, item in items:
                if kind == "bucket":
                    bucket = item
                    # append kernels at the next capacity: without this
                    # the first post-growth add compiles synchronously
                    # under the index lock and every queued query stalls
                    _append_kernel.lower(
                        S((cap, self._vec_cols), self._store_dtype),
                        S((cap, ncols), jnp.int32),
                        S((cap,), jnp.float32),
                        S((bucket, self._vec_cols), self._store_dtype),
                        S((bucket, ncols), jnp.int32),
                        S((bucket,), jnp.float32),
                        S((), jnp.int32),
                    ).compile()
                    if self._quant:
                        _append_scales_kernel.lower(
                            S((cap,), jnp.float32), S((bucket,), jnp.float32),
                            S((), jnp.int32),
                        ).compile()
                else:
                    qn, k, raw_backend = item
                    backend = self._backend(raw_backend, cap=cap)
                    q = S((qn, self.d_pad), jnp.float32)
                    b = S((cap,), jnp.float32)
                    if self._quant:
                        v = S((cap, self._vec_cols), jnp.int8)
                        sc = S((cap,), jnp.float32)
                        pruned = (
                            pallas_topk_int4_pruned if self._int4 else pallas_topk_int8_pruned
                        )
                        fallback = xla_topk_int4 if self._int4 else xla_topk_int8
                        if backend == "pallas":
                            pruned.lower(
                                q, v, sc, b, k=k,
                                block_rows=self._kernel_block_rows(int8=True, rows=cap),
                            ).compile()
                        else:
                            fallback.lower(q, v, sc, b, k=k).compile()
                    else:
                        v = S((cap, self.d_pad), self._store_dtype)
                        _search_plain.lower(
                            q, v, b, k=k, backend=backend,
                            block_rows=self._kernel_block_rows(int8=False, rows=cap),
                        ).compile()
                self._warmed.add((cap, (kind, item)))
                self._warm_stats["kernels"] += 1
            self._warm_stats["tiers"] += 1
            if not quiet:
                logger.info("warmed tier %d (%d kernels)", cap, len(items))
        except Exception:  # noqa: BLE001 - warming must never break serving
            logger.exception("tier warm failed (capacity %d)", cap)

    def add(self, chunks: list[Chunk], embeddings: np.ndarray) -> list[int]:
        """Append chunks with their embeddings; returns assigned rows.

        Re-adding an existing chunk id tombstones the old row first
        (delete-then-reinsert idempotency, ref ``processors.py:363-369``).

        Concurrency: all host-side prep (normalize, quantize, pad) and the
        host→device transfers run OUTSIDE the index lock; the lock only
        covers per-slice commits (growth, the async append dispatch,
        host-map update). Big batches commit in ``append_slice_rows``
        slices, so a concurrent query waits at most one small transfer +
        one tiny append kernel, never a monolithic 100+ MB copy
        (bench_streaming during-build p95 was 23× idle before this;
        SURVEY §7 "Concurrent build + query")."""
        n = len(chunks)
        if n == 0:
            return []
        embeddings = np.asarray(embeddings, np.float32)
        assert embeddings.shape == (n, self.dim), (embeddings.shape, n, self.dim)

        # -- host prep (no lock) --------------------------------------------
        # pad the batch to a pow2 bucket so jit specializations stay few
        bucket = _pow2_at_least(n, 64)
        vpad = np.zeros((bucket, self.d_pad), np.float32)
        vpad[:n, : self.dim] = embeddings
        if self.metric == "cosine":
            norms = np.linalg.norm(vpad[:n], axis=1, keepdims=True)
            vpad[:n] /= np.maximum(norms, 1e-12)
        bpad = np.full(bucket, NEG_INF, np.float32)
        bpad[:n] = (
            -np.sum(vpad[:n] * vpad[:n], axis=1) if self.metric == "l2" else 0.0
        )
        # schema slot assignment mutates shared host state → brief lock
        with self._lock:
            cols = np.asarray(
                [self.schema.encode_row(c.metadata) for c in chunks], np.int32
            )
        cpad = np.full((bucket, self.schema.max_columns), -(2**31), np.int32)
        cpad[:n] = cols
        if self._int8:
            amax = np.maximum(np.abs(vpad).max(axis=1), 1e-12)
            spad = (amax / 127.0).astype(np.float32)
            qpad = np.clip(np.round(vpad / spad[:, None]), -127, 127).astype(np.int8)
            host_vec = qpad
        elif self._int4:
            # packed nibbles: byte j = col j (low) | col j + d_pad/2 (high)
            # — matches ops.topk.quantize_rows_int4 / unpack_int4
            amax = np.maximum(np.abs(vpad).max(axis=1), 1e-12)
            spad = (amax / 7.0).astype(np.float32)
            q4 = np.clip(np.round(vpad / spad[:, None]), -7, 7).astype(np.int32)
            half = self.d_pad // 2
            host_vec = ((q4[:, :half] & 0xF) | ((q4[:, half:] & 0xF) << 4)).astype(
                np.uint8
            ).view(np.int8)
            if self._host_rerank:
                s8pad = (amax / 127.0).astype(np.float32)
                q8pad = np.clip(np.round(vpad / s8pad[:, None]), -127, 127).astype(np.int8)
        else:
            host_vec = vpad  # converts to the store dtype per slice below
            spad = None
        new_chunks = [
            Chunk(c.id, c.document_id, c.content, c.chunk_index, c.metadata)
            for c in chunks
        ]

        # growth ahead? compile the next tier's executables NOW, on this
        # writer thread with no lock held — queries keep running against
        # the current arrays and never wait on a compile (cold-cache
        # pruned-kernel compiles run minutes through a remote tunnel)
        slice_rows = self.config.append_slice_rows or bucket
        with self._lock:
            projected = self.size + bucket
            new_cap = self.capacity
            while new_cap < projected:
                new_cap *= 2
            if len(self._seen_buckets) < 16:
                self._seen_buckets.add(min(bucket, slice_rows))
        if new_cap > self.capacity:
            self.ensure_tier_ready(new_cap)
            with self._lock:
                # one jump to the final tier: per-slice grows would pass
                # through intermediate capacities whose kernels were
                # never warmed
                self._grow(new_cap)

        # -- sliced commits: transfer + dispatch one slice at a time --------
        def _stage(off: int):
            """Enqueue one slice's host→device transfers (device_put is
            async — staging slice k+1 BEFORE slice k's pacing probe
            overlaps its copy with the probe wait, VERDICT r3 item 8)."""
            s_n = min(slice_rows, bucket - off)  # pow2 (both are pow2)
            sl = slice(off, off + s_n)
            return (
                s_n,
                self._put(jnp.asarray(host_vec[sl], self._store_dtype)),
                self._put(jnp.asarray(cpad[sl])),
                self._put(jnp.asarray(bpad[sl])),
                self._put(jnp.asarray(spad[sl])) if self._quant else None,
            )

        rows: list[int] = []
        offset = 0
        staged = _stage(0)
        while offset < n:
            s_n, dev_vec, dev_cols, dev_bias, dev_scales = staged
            sl = slice(offset, offset + s_n)
            if offset + s_n < n:
                staged = _stage(offset + s_n)
            real = min(n - offset, s_n)  # live rows in this slice
            with self._lock:
                # delete-then-reinsert atomicity per slice: ids being
                # re-added in THIS slice tombstone inside the same lock
                # hold as their re-insert, so an updated chunk is never
                # observably missing, and a failure before any commit
                # leaves the old rows fully intact
                stale = [
                    c.id
                    for c in new_chunks[offset : offset + real]
                    if c.id in self._id_to_row
                ]
                if stale:
                    self.delete(stale)
                self._grow(self.size + s_n)
                start = self.size
                self._vectors, self._cols, self._bias = _append_kernel(
                    self._vectors, self._cols, self._bias,
                    dev_vec, dev_cols, dev_bias, jnp.int32(start),
                )
                if self._quant:
                    self._scales = _append_scales_kernel(
                        self._scales, dev_scales, jnp.int32(start)
                    )
                if self._host_rerank:
                    self._host_q8[start : start + s_n] = q8pad[sl]
                    self._host_s8[start : start + s_n] = s8pad[sl]
                for i in range(real):
                    c = new_chunks[offset + i]
                    row = start + i
                    self._chunks.append(c)
                    self._id_to_row[c.id] = row
                    self._doc_rows.setdefault(c.document_id, []).append(row)
                    rows.append(row)
                # slice padding rows (final slice only) carry NEG_INF bias
                # and no chunk; the NEXT append's start overwrites them
                self.size += real
                self.live_count += real
                self._maybe_warm_next_tier()
                pace_bias = self._bias
            # writer pacing (no lock): materialize one element of the
            # slice just written, so the next slice's transfer does not
            # enqueue until this one executed — a concurrent query then
            # waits behind at most ONE in-flight slice, not a convoy.
            # (Skipped multi-process: a global array's single element is
            # not host-addressable everywhere.)
            if not getattr(self, "_multi_process", False):
                try:
                    np.asarray(_probe_row(pace_bias, jnp.int32(start)))
                except Exception:  # noqa: BLE001 - pacing is best-effort
                    logger.exception("append pacing probe failed")
            offset += s_n
        return rows

    def update_metadata(self, chunk_ids: list[str], metadatas: list[dict]) -> int:
        """In-place metadata update (no re-embedding): host chunk records
        change and the device filter columns are re-encoded + scattered.
        The metadata-edit path of the reference's Excel metadata screens —
        content/vectors are untouched, only filterable fields move."""
        with self._lock:
            rows: list[int] = []
            cols: list[list[int]] = []
            for cid, meta in zip(chunk_ids, metadatas):
                row = self._id_to_row.get(cid)
                if row is None:
                    continue
                chunk = self._chunks[row]
                if chunk is None:
                    continue
                chunk.metadata = meta
                rows.append(row)
                cols.append(self.schema.encode_row(meta))
            if not rows:
                return 0
            # pad to a pow2 bucket (repeat the first update) so jit
            # specializations stay bounded, same as delete()
            bucket = _pow2_at_least(len(rows), 8)
            rows_p = rows + [rows[0]] * (bucket - len(rows))
            cols_p = cols + [cols[0]] * (bucket - len(rows))
            self._cols = _update_cols_kernel(
                self._cols, jnp.asarray(rows_p, jnp.int32), jnp.asarray(cols_p, jnp.int32)
            )
            return len(rows)

    def delete(self, chunk_ids: list[str]) -> int:
        """Tombstone rows for the given chunk ids; returns count deleted."""
        with self._lock:
            rows = [self._id_to_row[cid] for cid in chunk_ids if cid in self._id_to_row]
            if not rows:
                return 0
            # pad to a pow2 bucket (repeat first row) to bound specializations
            padded = rows + [rows[0]] * (_pow2_at_least(len(rows), 8) - len(rows))
            self._bias = _tombstone_kernel(self._bias, jnp.asarray(padded, jnp.int32))
            for cid in chunk_ids:
                row = self._id_to_row.pop(cid, None)
                if row is None:
                    continue
                chunk = self._chunks[row]
                if chunk is not None:
                    dr = self._doc_rows.get(chunk.document_id)
                    if dr is not None:
                        try:
                            dr.remove(row)
                        except ValueError:
                            pass
                        if not dr:
                            del self._doc_rows[chunk.document_id]
                self._chunks[row] = None
                self.live_count -= 1
            self._maybe_auto_compact()
            return len(rows)

    def _maybe_auto_compact(self) -> None:
        """Compact when tombstones dominate (policy knob:
        IndexConfig.auto_compact_ratio). Runs under the index lock; IVF
        state is rebuilt-on-demand after compaction clears it."""
        ratio = self.config.auto_compact_ratio
        if ratio <= 0 or self.size < 4 * self.config.block_rows:
            return
        dead = self.size - self.live_count
        if dead / max(self.size, 1) >= ratio:
            had_ivf = self._ivf is not None
            logger.info(
                "auto-compact: %d/%d rows are tombstones (>= %.0f%%)",
                dead,
                self.size,
                ratio * 100,
            )
            self.compact()
            if had_ivf and self.live_count > 0:
                self.build_ivf()

    def delete_by_document_id(self, document_id: str) -> int:
        with self._lock:
            rows = list(self._doc_rows.get(document_id, ()))
            ids = [self._chunks[r].id for r in rows if self._chunks[r] is not None]
            return self.delete(ids)

    def clear(self) -> None:
        with self._lock:
            self._reset()

    def reorder(self, permutation: np.ndarray) -> None:
        """Permute rows in place (device arrays + host maps).

        Used by the IVF builder to sort rows by cluster so probed clusters
        are contiguous block ranges. ``permutation[new_row] = old_row`` and
        must cover exactly ``self.size`` rows."""
        with self._lock:
            perm = np.asarray(permutation, np.int64)
            assert perm.shape == (self.size,), (perm.shape, self.size)
            full = np.concatenate([perm, np.arange(self.size, self.capacity)])
            self._apply_permutation(full)
            old_chunks = self._chunks
            self._chunks = [old_chunks[o] for o in perm]
            self._rebuild_host_maps()

    def _rebuild_host_maps(self) -> None:
        """Recompute _id_to_row/_doc_rows from _chunks (after any row
        movement — reorder, compaction)."""
        self._id_to_row = {}
        self._doc_rows = {}
        for new_row, c in enumerate(self._chunks):
            if c is not None:
                self._id_to_row[c.id] = new_row
                self._doc_rows.setdefault(c.document_id, []).append(new_row)

    def _apply_permutation(self, idx: np.ndarray) -> None:
        """Gather all device rows by ``idx`` (length == capacity).

        Overridable array-movement hook: the sharded index swaps in a
        shard_map local gather (block-diagonal permutations) or a GSPMD
        global gather (cross-shard moves, e.g. compaction).

        The device gather holds old + new copies (~2× the index bytes);
        when that exceeds the chip's memory limit the permutation stages
        through the host instead — pull rows in chunks, free the device
        arrays, permute host-side, push back (device peak ≈ 1× + one
        chunk; the round-trip is fine at build/maintenance cadence)."""
        if self._host_q8 is not None:
            hidx = np.asarray(idx)
            self._host_q8 = self._host_q8[hidx]
            self._host_s8 = self._host_s8[hidx]
        if self._should_stage_reorder():
            return self._apply_permutation_host(idx)
        gidx = jnp.asarray(idx, jnp.int32)
        self._vectors = self._put(jnp.take(self._vectors, gidx, axis=0))
        self._cols = self._put(jnp.take(self._cols, gidx, axis=0))
        self._bias = self._put(jnp.take(self._bias, gidx, axis=0))
        if self._quant:
            self._scales = self._put(jnp.take(self._scales, gidx, axis=0))

    def _should_stage_reorder(self) -> bool:
        import os

        dev = self._device
        if dev is None:
            try:
                dev = jax.devices()[0]
            except Exception:  # noqa: BLE001 - no backend
                return False
        try:
            stats = dev.memory_stats() or {}
        except Exception:  # noqa: BLE001 - PJRT plugins may raise UNIMPLEMENTED
            stats = {}
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use")
        if not limit and dev.platform == "tpu":
            # remote/tunneled TPUs report no stats; assume a 16 GB chip
            # (v5e) unless told otherwise
            try:
                limit = int(os.environ.get("YRT_HBM_BYTES", 16 * 1024**3))
            except ValueError:
                logger.warning("bad YRT_HBM_BYTES=%r; using 16 GB", os.environ["YRT_HBM_BYTES"])
                limit = 16 * 1024**3
        if not limit:
            return False
        total = self.nbytes() + (self._scales.nbytes if self._quant else 0)
        if in_use is not None:
            # the gather needs ~1.3x the index bytes of FREE memory (new
            # copies + workspace; the old arrays are inside bytes_in_use)
            return 1.3 * total > limit - in_use
        # no usage info: old + new copies live at once, plus workspace and
        # deferred deallocation of in-flight buffers — 2.5x observed safe
        # (2x OOMed a 6.4 GB index on a 16 GB chip)
        return 2.5 * total > limit

    def _apply_permutation_host(self, idx: np.ndarray) -> None:
        logger.info("host-staged reorder (%d rows, %.1f GB index)",
                    len(idx), self._vectors.nbytes / 1e9)

        def pull(arr):
            # native-dtype host buffer (bf16 via ml_dtypes): 1x the device
            # bytes, not a widened f32 copy
            out = np.empty(arr.shape, arr.dtype)
            step = 1 << 20
            for i in range(0, arr.shape[0], step):
                out[i : i + step] = np.asarray(arr[i : i + step])
            return out

        v = pull(self._vectors)
        c = pull(self._cols)
        b = np.asarray(self._bias)
        s = np.asarray(self._scales) if self._quant else None
        # permute host-side, free the device copies, then push — new
        # arrays land in locals first so a failed push cannot leave the
        # index half-assigned (the host copies still exist to retry)
        v, c, b = v[idx], c[idx], b[idx]
        if self._quant:
            s = s[idx]
        self._vectors = self._cols = self._bias = None
        if self._quant:
            self._scales = None
        new_v = self._put(jnp.asarray(v, self._store_dtype))
        new_c = self._put(c)
        new_b = self._put(b)
        new_s = self._put(s) if self._quant else None
        self._vectors, self._cols, self._bias = new_v, new_c, new_b
        if self._quant:
            self._scales = new_s

    def compact(self) -> None:
        """Rebuild arrays dropping tombstones (periodic maintenance)."""
        with self._lock:
            live = [(r, c) for r, c in enumerate(self._chunks) if c is not None]
            if not live:
                self._reset()
                return
            rows = np.asarray([r for r, _ in live])
            # chunked dequantized gather: bounded device memory (the full
            # f32 view is 4x the int8 bytes — OOM at multi-M rows) with
            # pow2-padded gathers (bounded jit specializations)
            vecs = np.empty((len(rows), self.dim), np.float32)
            step = 1 << 20
            for i in range(0, len(rows), step):
                part, n_valid = self.dequantize_take_padded(rows[i : i + step])
                vecs[i : i + n_valid] = np.asarray(part)[:n_valid, : self.dim]
            chunks = [c for _, c in live]
            schema = self.schema
            self._reset()
            self.schema = schema  # keep slot assignments stable
            self.add(chunks, vecs)

    # -- search ------------------------------------------------------------

    def search(
        self,
        query_embeddings: np.ndarray,
        top_k: int = 5,
        filters: dict[str, Any] | None = None,
        backend: str = "auto",
    ) -> list[list[tuple[Chunk, float]]]:
        """Batched top-k search. Returns per-query (chunk, similarity) lists.

        Filters compile to a fused device mask; uncompilable filters fall
        back to a host pre-filter over raw metadata (explicit bias array)."""
        q = np.asarray(query_embeddings, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        assert q.shape[1] == self.dim, (q.shape, self.dim)
        n_q = q.shape[0]
        # pow2 query-batch bucket: every distinct q count would otherwise
        # compile its own executable (the coalescer merges variable burst
        # sizes). The kernel is HBM-bound on the index read, so padded
        # query rows are nearly free; padding results are sliced off below.
        q_bucket = 1 << max(n_q - 1, 0).bit_length()
        qpad = np.zeros((q_bucket, self.d_pad), np.float32)
        qpad[:n_q, : self.dim] = q
        if self.metric == "cosine":
            qpad /= np.maximum(np.linalg.norm(qpad, axis=1, keepdims=True), 1e-12)
        elif self.metric == "l2":
            # score = 2 q·x - ||x||^2 (norm term lives in the bias)
            qpad *= 2.0
        queries = jnp.asarray(qpad)

        # dispatch under the lock: appends donate the old device buffers
        # (in-place dynamic_update_slice), so a search must enqueue against
        # a consistent snapshot before any concurrent add invalidates it.
        # Only the (async) dispatch is serialized — result materialization
        # below happens outside the lock.
        with self._lock:
            vectors, cols, bias = self._vectors, self._cols, self._bias
            k_eff = min(top_k, max(self.live_count, 1))
            # int4 two-stage: ask the packed kernel for a pow2-bucketed
            # candidate multiple, re-rank on host from the int8 shadow
            k_req = k_eff
            host_rr = self._host_rerank
            if host_rr:
                mult = self.config.int4_rerank_multiplier
                k2 = _pow2_at_least(max(int(np.ceil(k_eff * mult)), k_eff), 16)
                if self.live_count < k2:
                    k2 = 1 << max(self.live_count.bit_length() - 1, 0)
                k_req = max(k2, k_eff)
                hq8, hs8 = self._host_q8, self._host_s8

            filt = None
            if filters:
                try:
                    compiled = compile_filter(filters, self.schema)
                    filt = self._filter_cache.setdefault(compiled.signature(), compiled)
                    filt_consts = compiled.consts  # constants from *this* query
                except FilterError:
                    # host fallback: explicit bias from raw metadata
                    hb = np.full(self.capacity, NEG_INF, np.float32)
                    keep = [
                        r
                        for r, c in enumerate(self._chunks)
                        if c is not None and host_eval(filters, c.metadata)
                    ]
                    hb[keep] = 0.0
                    # jit (not op-by-op): bias may be a multi-process
                    # global array, which cannot run eager ops
                    bias = _add_bias(bias, jnp.asarray(hb))

            if filt is not None:
                bias = _filter_bias(cols, bias, jnp.asarray(filt_consts), filt.signature(), filt)
            resolved = self._backend(backend)
            if resolved != "pallas_interpret" and len(self._seen_sigs) < 8:
                # raw backend recorded; re-resolved at warm time for the
                # bigger capacity (auto can flip xla -> pallas on growth)
                sig = (queries.shape[0], k_req, backend)
                if sig not in self._seen_sigs:
                    self._seen_sigs.add(sig)
                    # a sig first seen after the 75% warm trigger still
                    # needs its next-tier executable
                    self._maybe_warm_next_tier()
            scores, rows = self._run_search(queries, vectors, bias, k_req, resolved)
            # reference capture, not a copy (list(...) of a multi-million
            # entry list cost ~ms per query under the lock). Safe because
            # every structural mutation REPLACES the list object
            # (_reset/compact/reorder build new lists) while in-place ops
            # are benign: add() appends (rows beyond our snapshot size are
            # never returned by this search), delete() writes None (the
            # materialization loop already skips None rows).
            chunks_snapshot = self._chunks

            # closed-loop nprobe tuning: every Nth IVF batch also runs the
            # brute kernel on the same snapshot (shadow check); observed
            # recall drives n_probe up/down (ROADMAP r1 item 6)
            shadow = None
            if self._ivf is not None and self.config.ivf_recall_target > 0:
                self._ivf_tune_counter += 1
                if self._ivf_tune_counter % self.config.ivf_tune_interval == 0:
                    shadow = self._run_brute(queries, vectors, bias, k_eff, resolved)

        scores = np.asarray(scores)[:n_q]
        rows = np.asarray(rows)[:n_q]
        # the tuner compares like-for-like: pre-rerank kernel rows vs the
        # brute shadow (both raw storage precision) — re-ranked rows would
        # show a quantizer-rank gap no n_probe increase can close
        rows_raw = rows
        if host_rr and k_req > k_eff:
            scores, rows = self._host_rerank_candidates(
                qpad[:n_q], scores, rows, hq8, hs8, k_eff
            )
        if shadow is not None:
            self._tune_nprobe(rows_raw[:, :k_eff], np.asarray(shadow[1])[:n_q], k_eff)
        out: list[list[tuple[Chunk, float]]] = []
        for qi in range(scores.shape[0]):
            hits: list[tuple[Chunk, float]] = []
            for s, r in zip(scores[qi], rows[qi]):
                if s <= NEG_INF / 2:
                    continue
                chunk = chunks_snapshot[r] if r < len(chunks_snapshot) else None
                if chunk is None:
                    continue
                hits.append((chunk, float(s)))
            out.append(hits)
        return out

    def _host_rerank_candidates(
        self, qpad, scores, rows, hq8, hs8, k: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Re-score int4 candidates from the host int8 shadow copy.

        The device kernel over-fetches mult*k candidates from packed
        nibbles (cheap, HBM-optimal); this exact-ish second stage removes
        most of the int4 quantization rank error for the price of a tiny
        host GEMM (k2 x d per query). qpad is the metric-adjusted query
        (cosine: normalized; l2: pre-doubled, norm term re-added here)."""
        n_q, k2 = rows.shape
        out_s = np.full((n_q, k), NEG_INF, np.float32)
        out_r = np.zeros((n_q, k), np.int32)
        for qi in range(n_q):
            valid = scores[qi] > NEG_INF / 2
            r = rows[qi][valid]
            if r.size == 0:
                continue
            v = hq8[r].astype(np.float32) * hs8[r][:, None]
            s = v @ qpad[qi]
            if self.metric == "l2":
                s = s - np.sum(v * v, axis=1)
            order = np.argsort(-s, kind="stable")[:k]
            out_s[qi, : order.size] = s[order]
            out_r[qi, : order.size] = r[order]
        return out_s, out_r

    def _backend(self, backend: str, cap: int | None = None) -> str:
        if backend != "auto":
            return backend
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        if on_tpu and (cap or self.capacity) >= 8 * self.config.block_rows:
            return "pallas"
        return "xla"

    def dequantized_vectors(self) -> jnp.ndarray:
        """Full-precision view of stored vectors (f32).

        Materializes [capacity, d] f32 on device — 4× the int8 footprint.
        At multi-million-row scale use ``dequantized_rows`` (chunked) or
        ``dequantize_take`` (row subset) instead; the IVF builder does."""
        if self._int4:
            return unpack_int4(self._vectors).astype(jnp.float32) * self._scales[:, None]
        if self._int8:
            return self._vectors.astype(jnp.float32) * self._scales[:, None]
        return self._vectors.astype(jnp.float32)

    def dequantized_rows(self, start: int, count: int) -> jnp.ndarray:
        """f32 view of rows [start, start+count) — bounded device memory
        (the full-index f32 view is 4× the int8 bytes and OOMs one chip
        past ~4M rows at d=768)."""
        if self._int4:
            return _dequant_slice_int4(
                self._vectors, self._scales, jnp.int32(start), count
            )
        if self._int8:
            return _dequant_slice_int8(
                self._vectors, self._scales, jnp.int32(start), count
            )
        return jax.lax.dynamic_slice_in_dim(self._vectors, start, count).astype(jnp.float32)

    def dequantize_take(self, rows) -> jnp.ndarray:
        """f32 gather of an arbitrary row subset (k-means fit samples)."""
        idx = jnp.asarray(rows, jnp.int32)
        if self._int4:
            return _dequant_take_int4(self._vectors, self._scales, idx)
        if self._int8:
            return _dequant_take_int8(self._vectors, self._scales, idx)
        return jnp.take(self._vectors, idx, axis=0).astype(jnp.float32)

    def dequantize_take_padded(self, rows: np.ndarray) -> tuple[jnp.ndarray, int]:
        """Like ``dequantize_take`` but the gather index pads to a pow2
        bucket (repeating the first row) so repeated maintenance loops
        keep bounded jit specializations (CLAUDE.md static-shape
        invariant). Returns (padded [B, d_pad] f32, n_valid) — trim
        host-side after materializing."""
        rows = np.asarray(rows, np.int64)
        n = len(rows)
        bucket = _pow2_at_least(max(n, 1), 4096)
        if bucket > n:
            pad_val = rows[0] if n else 0
            rows = np.concatenate([rows, np.full(bucket - n, pad_val, np.int64)])
        return self.dequantize_take(rows), n

    def _run_search(self, queries, vectors, bias, k: int, backend: str):
        """Overridable search dispatch (ShardedVectorIndex swaps in the
        shard_map per-shard + all-gather merge path)."""
        if self._ivf is not None:
            mult = self.config.ivf_rerank_multiplier
            if mult > 1.0 and not self._host_rerank:
                # int4's host int8-shadow re-rank (search()) re-scores at
                # HIGHER precision than the stored values, so the on-device
                # residual pass would be strictly redundant here
                # probe deeper, then exact re-score (residual re-rank):
                # k2 pow2-bucketed so the rerank jit cache stays bounded.
                # On small indexes clamp to the largest pow2 <= live_count
                # (a raw live_count would mint one executable per size as
                # the KB streams in — the static-shape invariant)
                k2 = _pow2_at_least(max(int(np.ceil(k * mult)), k), 16)
                if self.live_count < k2:
                    k2 = 1 << max(self.live_count.bit_length() - 1, 0)
                if k2 > k:
                    s2, r2 = self._run_ivf_search(queries, vectors, bias, k2, backend)
                    return _residual_rerank(
                        queries, self.dequantize_take(r2.reshape(-1)),
                        bias, s2, r2, k,
                    )
            return self._run_ivf_search(queries, vectors, bias, k, backend)
        return self._run_brute(queries, vectors, bias, k, backend)

    def _kernel_block_rows(self, int8: bool, rows: int | None = None) -> int:
        """Brute-kernel tile size: grow the configured block toward the
        measured sweet spot while it divides the row count.

        ``config.block_rows`` (default 1024) sets the IVF *cluster block
        granularity* — probing reads whole blocks, so big blocks waste
        HBM reads on small clusters. The brute scan has no such
        constraint and bigger tiles amortize per-block overhead: swept
        on v5e at 1M×768/q8/k10, bf16 2.77→2.27 ms (1024→4096) and int8
        1.40→0.84 ms (2048→8192). Decoupling the two keeps IVF probe
        granularity fine while brute runs at its optimum."""
        br = self.config.block_rows
        target = 4096 if self._int4 else (8192 if int8 else 4096)
        n = rows if rows is not None else self.capacity
        while br < target and n % (2 * br) == 0:
            br *= 2
        return br

    def _run_brute(self, queries, vectors, bias, k: int, backend: str):
        if self._int4:
            br = self._kernel_block_rows(int8=True)
            if backend == "pallas":
                return pallas_topk_int4_pruned(
                    queries, vectors, self._scales, bias, k, block_rows=br
                )
            if backend == "pallas_interpret":
                return pallas_topk_int4_pruned(
                    queries, vectors, self._scales, bias, k, block_rows=br, interpret=True
                )
            return xla_topk_int4(queries, vectors, self._scales, bias, k)
        if self._int8:
            br = self._kernel_block_rows(int8=True)
            if backend == "pallas":
                return pallas_topk_int8_pruned(
                    queries, vectors, self._scales, bias, k, block_rows=br
                )
            if backend == "pallas_interpret":
                return pallas_topk_int8_pruned(
                    queries, vectors, self._scales, bias, k, block_rows=br, interpret=True
                )
            return xla_topk_int8(queries, vectors, self._scales, bias, k)
        return _search_plain(
            queries, vectors, bias, k, backend, self._kernel_block_rows(int8=False)
        )

    # -- IVF ---------------------------------------------------------------

    def build_ivf(self, n_lists: int | None = None, seed: int = 0) -> None:
        """Cluster-sort the index and enable probed search (ANN). Appends
        after this call land in always-probed tail blocks; call again to
        re-freeze after heavy growth."""
        from .ivf import build_ivf_state

        with self._lock:
            self._ivf = build_ivf_state(self, n_lists=n_lists, seed=seed)

    def drop_ivf(self) -> None:
        self._ivf = None

    def _tune_nprobe(self, ivf_rows: np.ndarray, brute_rows: np.ndarray, k: int) -> None:
        """Adjust n_probe from the observed IVF-vs-brute overlap@k.

        Growth is multiplicative toward the recall target; shrink needs
        comfortable headroom (+0.04) so the loop doesn't oscillate at the
        boundary. n_probe values stay few, so the probe-plan jit cache
        stays bounded."""
        overlap = float(
            np.mean(
                [
                    len(set(ivf_rows[i]) & set(brute_rows[i])) / max(k, 1)
                    for i in range(ivf_rows.shape[0])
                ]
            )
        )
        self._ivf_recall_est = overlap
        cfg = self.config
        with self._lock:
            st = self._ivf
            if st is None:
                return
            if overlap < cfg.ivf_recall_target and st.n_probe < st.n_lists:
                new = min(st.n_lists, max(st.n_probe + 1, int(st.n_probe * cfg.ivf_probe_step)))
                logger.info("nprobe tune: recall %.3f < %.2f → n_probe %d → %d",
                            overlap, cfg.ivf_recall_target, st.n_probe, new)
                st.n_probe = new
                self._ivf_tune_streak = 0
            elif overlap >= min(cfg.ivf_recall_target + 0.04, 1.0) and st.n_probe > cfg.ivf_min_probe:
                # shrink only after 3 consecutive comfortable observations:
                # one lucky small shadow batch (overlap can hit 1.0 on a
                # handful of queries) must not throw probes away — growth
                # is immediate, shrink is evidence-gated
                self._ivf_tune_streak += 1
                if self._ivf_tune_streak >= 3:
                    new = max(cfg.ivf_min_probe, int(st.n_probe / cfg.ivf_probe_step))
                    if new < st.n_probe:
                        logger.info("nprobe tune: recall %.3f comfortable ×%d → n_probe %d → %d",
                                    overlap, self._ivf_tune_streak, st.n_probe, new)
                        st.n_probe = new
                    self._ivf_tune_streak = 0
            else:
                self._ivf_tune_streak = 0

    def _run_ivf_search(self, queries, vectors, bias, k: int, backend: str):
        from ..ops.ivf import pallas_ivf_topk, xla_ivf_topk
        from .ivf import plan_max_blocks, probe_blocks

        st = self._ivf
        total_blocks = self.capacity // self.config.block_rows
        max_blocks = plan_max_blocks(st, queries.shape[0], total_blocks)
        if max_blocks >= total_blocks and backend not in ("pallas", "pallas_interpret"):
            # XLA fallback gathers max_blocks regardless of n_valid, so a
            # full-coverage plan degenerates to brute force. The pallas DMA
            # kernels loop only n_valid blocks — the actual probed union is
            # usually far below the static worst-case bound, so they stay
            # on the IVF path even when the padded plan spans everything.
            return self._run_brute(queries, vectors, bias, k, backend)
        margin = self.config.ivf_adaptive_margin
        adaptive = (
            {
                "adaptive_margin": jnp.float32(margin),
                "min_probe": jnp.int32(min(self.config.ivf_min_probe, st.n_probe)),
            }
            if margin > 0
            else {}
        )
        ids, n_valid = probe_blocks(
            queries,
            st.centroids,
            st.cluster_block_start,
            st.cluster_block_count,
            n_probe=st.n_probe,
            max_cluster_blocks=st.max_cluster_blocks,
            total_blocks=total_blocks,
            frozen_blocks=jnp.int32(st.frozen_blocks),
            max_blocks=max_blocks,
            **adaptive,
        )
        br = self.config.block_rows
        if self._int4:
            from ..ops.ivf import pallas_ivf_topk_int4_dma

            if backend in ("pallas", "pallas_interpret"):
                return pallas_ivf_topk_int4_dma(
                    queries, vectors, self._scales, bias, ids, n_valid, k,
                    block_rows=br, interpret=backend == "pallas_interpret",
                )
            # XLA fallback: dequantize (test-scale indexes only)
            return xla_ivf_topk(
                queries, self.dequantized_vectors(), bias, ids, n_valid, k, block_rows=br
            )
        if self._int8:
            from ..ops.ivf import pallas_ivf_topk_int8_dma

            if backend in ("pallas", "pallas_interpret"):
                return pallas_ivf_topk_int8_dma(
                    queries, vectors, self._scales, bias, ids, n_valid, k,
                    block_rows=br, interpret=backend == "pallas_interpret",
                )
            # XLA fallback: dequantize (test-scale indexes only)
            return xla_ivf_topk(
                queries, self.dequantized_vectors(), bias, ids, n_valid, k, block_rows=br
            )
        if backend in ("pallas", "pallas_interpret"):
            from ..ops.ivf import pallas_ivf_topk_dma

            return pallas_ivf_topk_dma(
                queries, vectors, bias, ids, n_valid, k,
                block_rows=br, interpret=backend == "pallas_interpret",
            )
        return xla_ivf_topk(queries, vectors, bias, ids, n_valid, k, block_rows=br)

    # -- introspection -----------------------------------------------------

    def get_by_id(self, chunk_id: str) -> Chunk | None:
        row = self._id_to_row.get(chunk_id)
        return self._chunks[row] if row is not None else None

    def count(self) -> int:
        return self.live_count

    def count_by_document(self, document_id: str) -> int:
        """Live chunk rows for one document (storage-state checks)."""
        return len(self._doc_rows.get(document_id, ()))

    def nbytes(self) -> int:
        return int(self._vectors.nbytes + self._cols.nbytes + self._bias.nbytes)

    def iter_live(self):
        for c in self._chunks:
            if c is not None:
                yield c


# ---------------------------------------------------------------------------
# jitted helpers (module-level so the cache is shared across indexes)
# ---------------------------------------------------------------------------


@jax.jit
def _add_bias(bias, extra):
    return bias + extra


@jax.jit
def _probe_row(bias, i):
    """One-element readback probe (append pacing): traced start index so
    every capacity shares one executable per capacity shape."""
    return jax.lax.dynamic_slice(bias, (i,), (1,))


@functools.partial(jax.jit, static_argnames=("count",))
def _dequant_slice_int8(vectors, scales, start, count: int):
    v = jax.lax.dynamic_slice_in_dim(vectors, start, count)
    s = jax.lax.dynamic_slice_in_dim(scales, start, count)
    return v.astype(jnp.float32) * s[:, None]


@jax.jit
def _dequant_take_int8(vectors, scales, idx):
    return jnp.take(vectors, idx, axis=0).astype(jnp.float32) * jnp.take(scales, idx)[:, None]


@functools.partial(jax.jit, static_argnames=("count",))
def _dequant_slice_int4(vectors, scales, start, count: int):
    v = jax.lax.dynamic_slice_in_dim(vectors, start, count)
    s = jax.lax.dynamic_slice_in_dim(scales, start, count)
    return unpack_int4(v).astype(jnp.float32) * s[:, None]


@jax.jit
def _dequant_take_int4(vectors, scales, idx):
    nib = unpack_int4(jnp.take(vectors, idx, axis=0))
    return nib.astype(jnp.float32) * jnp.take(scales, idx)[:, None]


@functools.partial(jax.jit, donate_argnums=(0,))
def _tombstone_kernel(bias, rows):
    return bias.at[rows].set(NEG_INF)


@functools.partial(jax.jit, donate_argnums=(0,))
def _update_cols_kernel(cols, rows, new_cols):
    return cols.at[rows].set(new_cols)


@functools.partial(jax.jit, donate_argnums=(0,))
def _append_scales_kernel(scales, new_scales, start):
    # jit (not op-by-op) so multi-process global scale arrays work
    return jax.lax.dynamic_update_slice(scales, new_scales, (start,))


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _append_kernel(vectors, cols, bias, new_vec, new_cols, new_bias, start):
    # `start` is traced so successive appends share one executable
    z = jnp.int32(0)
    vectors = jax.lax.dynamic_update_slice(vectors, new_vec, (start, z))
    cols = jax.lax.dynamic_update_slice(cols, new_cols, (start, z))
    bias = jax.lax.dynamic_update_slice(bias, new_bias, (start,))
    return vectors, cols, bias


@functools.partial(jax.jit, static_argnames=("k", "backend", "block_rows"))
def _search_plain(queries, vectors, bias, k: int, backend: str, block_rows: int):
    # pruned variant: running-threshold block pruning, exact results,
    # measured 13-15% faster than the always-select kernel at 1M x 768
    if backend == "pallas":
        return pallas_topk_pruned(queries, vectors, bias, k, block_rows=block_rows)
    if backend == "pallas_interpret":
        return pallas_topk_pruned(queries, vectors, bias, k, block_rows=block_rows, interpret=True)
    return xla_topk(queries, vectors, bias, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _residual_rerank(queries, cand_flat, bias, approx_scores, rows, k: int):
    """Exact f32 re-score of IVF candidates → true top-k of the k2 pool.

    queries [Q, d_pad] (metric-prescaled), cand_flat [Q*k2, d_pad] f32
    (dequantized gather), bias [capacity] (live/norm/filter bias),
    approx_scores/rows [Q, k2] from the probe pass. Padding candidates
    (approx ≤ NEG_INF/2) stay NEG_INF so they can't duplicate real rows."""
    q_n, k2 = rows.shape
    cand = cand_flat.reshape(q_n, k2, -1)
    s = jnp.einsum("qd,qkd->qk", queries, cand, preferred_element_type=jnp.float32)
    s = s + jnp.take(bias, rows)
    s = jnp.where(approx_scores > NEG_INF / 2, s, NEG_INF)
    top_s, top_i = jax.lax.top_k(s, k)
    return top_s, jnp.take_along_axis(rows, top_i, axis=1)


@functools.partial(jax.jit, static_argnames=("sig", "filt"))
def _filter_bias(cols, bias, consts, sig: str, filt):
    """Join a compiled metadata mask into the additive bias.

    `sig` keys the jit cache; `filt` is a canonical per-signature instance
    (DeviceVectorIndex._filter_cache) so identity-hashing matches `sig`.
    Elementwise over rows — under a sharded index the mask computes
    shard-locally with no communication."""
    mask = filt.mask(cols, consts)
    return bias + jnp.where(mask, 0.0, NEG_INF)
