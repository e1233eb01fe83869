"""Embedder implementations + factory.

Replaces the reference's embedding stack (``utu/rag/embeddings/``):
- ``TpuEmbedder``   — in-process jit-compiled encoder forward, batched with
  bucketed padding (replaces the HTTP ``ServiceEmbedder``,
  ``service_embedder.py:16-177``);
- ``HashEmbedder``  — deterministic host-side feature-hash embedding
  (hermetic tests + CPU fallback; the "fake embedder" SURVEY.md §4 calls
  for, but with meaningful bag-of-words cosine geometry);
- ``RemoteEmbedder``— OpenAI-compatible ``/embeddings`` or self-hosted
  ``/embed`` HTTP adapter with retry/health-check behavior mirroring
  ``openai_embedder.py:15-173`` (kept as a config option like the
  reference's factory, ``embeddings/factory.py:14-161``).
"""

from __future__ import annotations

import asyncio
import math
import os
import re
from typing import Any

import numpy as np

from ..core.config import EmbeddingConfig
from ..core.types import BaseEmbedder
from ..utils.http import post_json_with_retry
from ..utils.log import get_logger
from .tokenizer import HashTokenizer

logger = get_logger("models.embedder")


_FNV_OFFSET = 14695981039346656037
_FNV_PRIME = 1099511628211
_MASK64 = (1 << 64) - 1
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")


def _fnv_feat(token: bytes) -> int:
    h = _FNV_OFFSET
    for b in b"feat:" + token:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


class HashEmbedder(BaseEmbedder):
    """Feature-hashing bag-of-words embedder (deterministic, host-only).

    Tokens (ASCII word runs lowercased; every other codepoint/symbol is a
    single token) hash via FNV-1a-64 to a dimension; vectors are
    tf-weighted (1 + log tf), L2-normalized, positive-only (signed hashing
    can exactly cancel overlap signal on short texts).

    The hot loop is the native C kernel (youtu_rag_tpu/native/fasthash.c)
    when a compiler is available — the host-side throughput floor for
    10M-chunk builds — with a byte-identical Python fallback."""

    def __init__(self, dim: int = 512, use_native: bool = True):
        self._dim = dim
        self._use_native = use_native

    @property
    def dimension(self) -> int:
        return self._dim

    def embed_one(self, text: str) -> np.ndarray:
        counts: dict[int, int] = {}
        for m in _TOKEN_RE.finditer(text):
            tok = m.group(0)
            if tok.isascii():
                tok = tok.lower()
            h = _fnv_feat(tok.encode("utf-8")[:64])
            counts[h] = counts.get(h, 0) + 1
        vec = np.zeros(self._dim, np.float32)
        for h, c in counts.items():
            vec[h % self._dim] += np.float32(1.0) + np.float32(math.log(c))
        n = np.linalg.norm(vec)
        return vec / n if n > 0 else vec

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        if self._use_native:
            from ..native import hash_embed_batch_native

            out = hash_embed_batch_native(texts, self._dim)
            if out is not None:
                # rows the C kernel zeroed (tf-table overflow on texts
                # with >4096 distinct tokens) re-embed via the unbounded
                # Python path; any tokenized text has a nonzero vector,
                # so zero+nonblank reliably marks the failure
                for i, t in enumerate(texts):
                    if t.strip() and not out[i].any():
                        out[i] = self.embed_one(t)
                return out
        return np.stack([self.embed_one(t) for t in texts]) if texts else np.zeros((0, self._dim), np.float32)

    async def embed_texts(self, texts: list[str]) -> list[list[float]]:
        return self.embed_batch(texts).tolist()

    async def embed_query(self, query: str) -> list[float]:
        return self.embed_batch([query])[0].tolist()


class TpuEmbedder(BaseEmbedder):
    """Batched encoder forward under jit on TPU.

    Sequences pad to pow2 length buckets and pow2 batch buckets so the jit
    cache stays small; the forward is data-parallel over all local devices
    when a mesh is supplied (see youtu_rag_tpu.parallel.mesh)."""

    def __init__(
        self,
        config: EncoderConfigLike | None = None,
        params: dict | None = None,
        batch_size: int = 128,
        mesh=None,
        sp_mesh=None,
        long_max_len: int | None = None,
        seed: int = 0,
        tokenizer=None,
    ):
        import jax

        from .encoder import EncoderConfig, encode_tokens, init_encoder_params

        if config is None:
            # inference default: blockwise Pallas attention on TPU (kicks
            # in at seq >= 256; short buckets use XLA either way)
            on_tpu = jax.devices()[0].platform == "tpu"
            config = EncoderConfig(attention_impl="pallas" if on_tpu else "xla")
        self.cfg = config
        self.params = params if params is not None else init_encoder_params(self.cfg, seed)
        self.tokenizer = tokenizer or HashTokenizer(self.cfg.vocab_size, self.cfg.max_len)
        self.batch_size = batch_size
        self._mesh = mesh
        # dp size bounds the minimum batch bucket: floors are the smallest
        # MULTIPLE of dp >= 8 (short) / 4 (long), because _bucket doubles
        # and doubling preserves divisibility — max(8, dp) would break
        # P("dp") for non-pow2 device counts (e.g. dp=6 → bucket 8)
        self._dp = int(mesh.shape["dp"]) if mesh is not None else 1

        def fwd(params, ids, mask):
            emb, _ = encode_tokens(params, ids, mask, self.cfg)
            return emb

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._fwd = jax.jit(
                fwd,
                in_shardings=(
                    jax.tree.map(lambda _: NamedSharding(mesh, P()), self.params),
                    NamedSharding(mesh, P("dp", None)),
                    NamedSharding(mesh, P("dp", None)),
                ),
                out_shardings=NamedSharding(mesh, P("dp", None)),
            )
        else:
            self._fwd = jax.jit(fwd)

        # long-document path: with an 'sp' mesh, texts that tokenize past
        # max_len embed through the ring-attention encoder (sequence
        # sharded over chips) instead of being truncated
        self._sp_fwd = None
        if sp_mesh is not None:
            from ..parallel.sequence_parallel import make_sp_encoder

            self._sp_fwd = make_sp_encoder(self.cfg, sp_mesh, sp_axis="sp")
            self._sp_size = int(sp_mesh.shape["sp"])
            self._long_max = long_max_len or 8 * self.cfg.max_len

    @classmethod
    def from_weights_dir(cls, weights_dir, **kwargs) -> "TpuEmbedder":
        """Serve a ``scripts/train_embedder.py`` output directory:
        encoder_params.npz + encoder_config.json (exact architecture,
        incl. the lexical-residual pathway) + vocab.txt when the run
        trained a WordPiece vocabulary. The committed
        ``benchmarks/models/yrt_tiny_lex`` loads through here."""
        import os

        from .encoder import load_encoder_config, load_params_npz

        d = os.fspath(weights_dir)
        cfg = load_encoder_config(os.path.join(d, "encoder_config.json"))
        tokenizer = None
        vocab = os.path.join(d, "vocab.txt")
        if os.path.exists(vocab):
            from .wordpiece import WordPieceTokenizer

            tokenizer = WordPieceTokenizer(vocab, max_length=cfg.max_len)
        params = load_params_npz(os.path.join(d, "encoder_params.npz"))
        return cls(config=cfg, params=params, tokenizer=tokenizer, **kwargs)

    @classmethod
    def from_pretrained(
        cls,
        model_dir,
        pooling: str | None = None,
        dtype=None,
        attention_impl: str | None = None,
        max_len: int | None = None,
        **kwargs,
    ) -> "TpuEmbedder":
        """Serve a pretrained BERT-family checkpoint (bge/gte/e5 layouts)
        on TPU — the quality slot of the reference's remote embedding
        service (``service_embedder.py:16-177``). ``model_dir`` is an HF
        export: config.json + model.safetensors + vocab.txt."""
        import jax

        from .pretrained import load_pretrained_encoder

        if attention_impl is None:
            on_tpu = jax.devices()[0].platform == "tpu"
            attention_impl = "pallas" if on_tpu else "xla"
        params, cfg, tokenizer = load_pretrained_encoder(
            model_dir, pooling=pooling, dtype=dtype,
            attention_impl=attention_impl, max_len=max_len,
        )
        return cls(config=cfg, params=params, tokenizer=tokenizer, **kwargs)

    @property
    def dimension(self) -> int:
        return getattr(self.cfg, "embed_dim", self.cfg.out_dim)

    @staticmethod
    def _bucket(n: int, floor: int) -> int:
        b = floor
        while b < n:
            b *= 2
        return b

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        """Synchronous batched embed → [n, out_dim] f32 (L2-normalized).

        With an ``sp_mesh``, texts longer than ``max_len`` tokens detour
        through the sequence-parallel ring-attention forward (full
        content, no truncation)."""
        out = np.zeros((len(texts), self.dimension), np.float32)
        long_idx: list[int] = []
        if self._sp_fwd is not None:
            for j, t in enumerate(texts):
                if len(self.tokenizer.tokenize(t)) + 2 > self.cfg.max_len:
                    long_idx.append(j)
            if long_idx:
                long_embs = self._embed_long([texts[j] for j in long_idx])
                for row, j in enumerate(long_idx):
                    out[j] = long_embs[row]
        short = [(j, t) for j, t in enumerate(texts) if j not in set(long_idx)]
        bs = self.batch_size
        for i in range(0, len(short), bs):
            chunk = short[i : i + bs]
            rows = [j for j, _ in chunk]
            embs = self._embed_short([t for _, t in chunk])
            out[rows] = embs
        return out

    def _embed_long(self, texts: list[str]) -> np.ndarray:
        """Ring-attention embed of over-length texts: pow2 T buckets AND
        pow2 batch buckets (CLAUDE.md static-shape invariant — raw counts
        would mint a fresh ring-attention executable per distinct count),
        chunked by batch_size so huge long-doc waves can't OOM."""
        out = np.zeros((len(texts), self.dimension), np.float32)
        step = max(self.batch_size // 8, 1)  # long seqs: smaller waves
        for i in range(0, len(texts), step):
            chunk = texts[i : i + step]
            seqs = [self.tokenizer.encode(t, self._long_max) for t in chunk]
            t_need = max(len(s) for s in seqs)
            t_b = self._bucket(t_need, max(16 * self._sp_size, 16))
            n_b = self._bucket(len(chunk), self._dp * -(-4 // self._dp))
            ids = np.zeros((n_b, t_b), np.int32)
            mask = np.zeros((n_b, t_b), np.float32)
            for j, s in enumerate(seqs):
                ids[j, : len(s)] = s
                mask[j, : len(s)] = 1.0
            emb, _ = self._sp_fwd(self.params, ids, mask)
            out[i : i + len(chunk)] = np.asarray(emb)[: len(chunk)]
        return out

    def _embed_short(self, batch: list[str]) -> np.ndarray:
        ids, mask = self.tokenizer.batch(batch)
        t_b = min(self._bucket(ids.shape[1], 16), self.cfg.max_len)
        n_b = self._bucket(len(batch), self._dp * -(-8 // self._dp))
        ids_p = np.zeros((n_b, t_b), np.int32)
        mask_p = np.zeros((n_b, t_b), np.float32)
        ids_p[: len(batch), : min(ids.shape[1], t_b)] = ids[:, :t_b]
        mask_p[: len(batch), : min(mask.shape[1], t_b)] = mask[:, :t_b]
        emb = self._fwd(self.params, ids_p, mask_p)
        return np.asarray(emb)[: len(batch)]

    async def embed_texts(self, texts: list[str]) -> list[list[float]]:
        return self.embed_batch(texts).tolist()

    async def embed_query(self, query: str) -> list[float]:
        return self.embed_batch([query])[0].tolist()


EncoderConfigLike = Any  # forward ref without importing jax at module import


class RemoteEmbedder(BaseEmbedder):
    """HTTP embedding adapter (OpenAI `/embeddings` or service `/embed`).

    Retry-on-5xx/timeouts and batch pacing mirror
    ``openai_embedder.py:49-173`` / ``http_retry.py:16-103``."""

    def __init__(self, config: EmbeddingConfig):
        self.config = config
        self._dim = config.dimensions

    @property
    def dimension(self) -> int | None:
        return self._dim

    async def _post(self, path: str, payload: dict) -> dict:
        headers = {}
        if self.config.api_key:
            headers["Authorization"] = f"Bearer {self.config.api_key}"
        return await post_json_with_retry(
            self.config.base_url.rstrip("/") + path, payload, headers=headers, log=logger
        )

    async def embed_texts(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        bs = self.config.batch_size
        for i in range(0, len(texts), bs):
            batch = texts[i : i + bs]
            if self.config.provider == "openai":
                data = await self._post(
                    "/embeddings", {"model": self.config.model, "input": batch}
                )
                out.extend(item["embedding"] for item in data["data"])
            else:  # service
                data = await self._post("/embed", {"texts": batch})
                out.extend(data["embeddings"])
            if self.config.batch_delay and i + bs < len(texts):
                await asyncio.sleep(self.config.batch_delay)
        if out and self._dim is None:
            self._dim = len(out[0])
        return out

    async def embed_query(self, query: str) -> list[float]:
        return (await self.embed_texts([query]))[0]


class CoalescingEmbedder(BaseEmbedder):
    """Request-coalescing wrapper: concurrent embed calls inside a short
    window merge into ONE underlying batch dispatch.

    Why: on TPU each dispatch pays fixed overhead (host RPC + launch,
    ~tens of ms through a tunnel), so N concurrent single-query embeds —
    the API-server hot path, one per /query request — cost N dispatches
    while one [N, T] forward costs ~one. The reference pays this per HTTP
    call to its embedding service (``service_embedder.py:16-177``); here
    the batching happens in-process in front of the jit forward.

    Mechanics: calls enqueue (texts, future) and a lazily-started worker
    drains the queue — it waits ``window_ms`` after the first arrival
    (bounded by ``max_batch`` texts), embeds the concatenation once, and
    slices results back per caller. Errors propagate to every waiter in
    the merged batch. The worker restarts transparently if the event loop
    changed (tests spin up a loop per case)."""

    def __init__(self, inner: BaseEmbedder, window_ms: float = 3.0, max_batch: int = 256):
        self.inner = inner
        self.window_s = window_ms / 1e3
        self.max_batch = max_batch
        self._queue: asyncio.Queue | None = None
        self._worker: asyncio.Task | None = None
        self._loop: asyncio.AbstractEventLoop | None = None
        self.stats = {"dispatches": 0, "items": 0, "max_merged": 0}

    @property
    def dimension(self) -> int | None:
        return self.inner.dimension

    def _ensure_worker(self) -> asyncio.Queue:
        loop = asyncio.get_running_loop()
        if self._queue is None or self._loop is not loop or (self._worker and self._worker.done()):
            self._queue = asyncio.Queue()
            self._loop = loop
            self._worker = loop.create_task(self._run())
        return self._queue

    async def _run(self) -> None:
        queue = self._queue
        while True:
            first = await queue.get()
            batch = [first]
            n = len(first[0])
            deadline = asyncio.get_running_loop().time() + self.window_s
            while n < self.max_batch:
                remaining = deadline - asyncio.get_running_loop().time()
                if remaining <= 0:
                    break
                try:
                    item = await asyncio.wait_for(queue.get(), remaining)
                except asyncio.TimeoutError:
                    break
                batch.append(item)
                n += len(item[0])
            texts = [t for ts, _ in batch for t in ts]
            self.stats["dispatches"] += 1
            self.stats["items"] += len(texts)
            self.stats["max_merged"] = max(self.stats["max_merged"], len(batch))
            try:
                embs = await self.inner.embed_texts(texts)
            except Exception as e:  # noqa: BLE001 - fan the failure out
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(RuntimeError(str(e)))
                continue
            off = 0
            for ts, fut in batch:
                if not fut.done():
                    fut.set_result(embs[off : off + len(ts)])
                off += len(ts)

    async def embed_texts(self, texts: list[str]) -> list[list[float]]:
        if not texts:
            return []
        queue = self._ensure_worker()
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        queue.put_nowait((texts, fut))
        return await fut

    async def embed_query(self, query: str) -> list[float]:
        return (await self.embed_texts([query]))[0]


class EmbedderFactory:
    """Provider dispatch (ref: ``embeddings/factory.py:14-161``).

    ``auto`` resolves from env: remote endpoints if ``YRT_EMBEDDING_URL`` /
    ``UTU_EMBEDDING_URL`` is set, else the on-device TPU encoder, else the
    hash embedder on hosts without an accelerator."""

    @staticmethod
    def create(config: EmbeddingConfig | None = None, **kwargs) -> BaseEmbedder:
        config = config or EmbeddingConfig()
        inner = EmbedderFactory._create_inner(config, **kwargs)
        if config.coalesce_window_ms > 0:
            return CoalescingEmbedder(
                inner, window_ms=config.coalesce_window_ms, max_batch=config.batch_size
            )
        return inner

    @staticmethod
    def _create_inner(config: EmbeddingConfig, **kwargs) -> BaseEmbedder:
        provider = config.provider
        if provider == "auto":  # pragma: no cover - env-dependent
            url = os.environ.get("YRT_EMBEDDING_URL") or os.environ.get("UTU_EMBEDDING_URL")
            if url:
                config = config.model_copy(update={"base_url": url, "provider": "service"})
                provider = "service"
            else:
                provider = "tpu"
        if provider == "hash":
            return HashEmbedder(dim=config.dimensions or 256)
        if provider == "tpu":
            if config.pretrained_dir:
                return TpuEmbedder.from_pretrained(
                    config.pretrained_dir, batch_size=config.batch_size, **kwargs
                )
            if config.weights_dir:
                return TpuEmbedder.from_weights_dir(
                    config.weights_dir, batch_size=config.batch_size, **kwargs
                )
            return TpuEmbedder(batch_size=config.batch_size, **kwargs)
        if provider in ("openai", "service"):
            # env fallbacks apply INDEPENDENTLY: a configured base_url
            # with a secret passed via env must still send the key
            config = config.model_copy(
                update={
                    "base_url": config.base_url
                    or os.environ.get("YRT_EMBEDDING_URL")
                    or os.environ.get("UTU_EMBEDDING_URL"),
                    "api_key": config.api_key
                    or os.environ.get("YRT_EMBEDDING_API_KEY")
                    or os.environ.get("UTU_EMBEDDING_API_KEY"),
                }
            )
            if not config.base_url:
                raise ValueError(
                    f"embedding provider {provider!r} needs base_url (config) or "
                    "YRT_EMBEDDING_URL / UTU_EMBEDDING_URL in the environment"
                )
            return RemoteEmbedder(config)
        raise ValueError(f"unknown embedding provider {provider!r}")
