"""Native host kernels (C via cffi, built at first import, cached).

See fasthash.c. Degrades gracefully: if no C compiler is available the
Python fallbacks in models/embedder.py are used (identical outputs —
parity is tested)."""

from __future__ import annotations

import os
from pathlib import Path

from ..utils.log import get_logger

logger = get_logger("native")

_lib = None
_ffi = None
_tried = False


def _build_dir() -> Path:
    d = Path(
        os.environ.get(
            "YRT_NATIVE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "youtu_rag_tpu", "native"),
        )
    )
    d.mkdir(parents=True, exist_ok=True)
    return d


def get_fasthash():
    """Returns (ffi, lib) or (None, None) when native build is unavailable."""
    global _lib, _ffi, _tried
    if _lib is not None or _tried:
        return _ffi, _lib
    _tried = True
    try:
        from cffi import FFI

        src = (Path(__file__).parent / "fasthash.c").read_text()
        ffi = FFI()
        ffi.cdef(
            """
            int hash_embed_one(const char *text, int len, float *out, int dim);
            void hash_embed_batch(const char *buf, const int *offsets,
                                  int n_texts, float *out, int dim);
            int tokenize_ids(const char *text, int len, int32_t *out,
                             int max_out, int n_buckets, int n_special);
            void tokenize_ids_batch(const char *buf, const int *offsets,
                                    int n_texts, int32_t *out, int *counts,
                                    int max_len, int n_buckets, int n_special);
            """
        )
        build = _build_dir()
        ffi.set_source(
            "_yrt_fasthash",
            src,
            extra_compile_args=["-O3", "-fno-math-errno"],
        )
        # use the path ffi.compile returns — a glob could pick a stale .so
        # from another Python ABI in the persistent cache dir and disable
        # the native kernels for the whole process
        so = ffi.compile(tmpdir=str(build), verbose=False)
        import importlib.util
        import sys
        spec = importlib.util.spec_from_file_location("_yrt_fasthash", so)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["_yrt_fasthash"] = mod
        spec.loader.exec_module(mod)
        _ffi, _lib = mod.ffi, mod.lib
        logger.info("native fasthash kernel loaded (%s)", Path(so).name)
    except Exception:  # noqa: BLE001 - fall back to python paths
        logger.exception("native fasthash unavailable; using python fallback")
        _ffi, _lib = None, None
    return _ffi, _lib


def tokenize_ids_native(text: str, max_out: int, n_buckets: int, n_special: int):
    """Tokenize one string into hashed ids via the C kernel; None if
    unavailable. ``text`` is lowercased here (full-Unicode folding stays
    in Python; the C scanner assumes pre-folded input)."""
    import numpy as np

    ffi, lib = get_fasthash()
    if lib is None:
        return None
    lowered = text.lower()
    enc = lowered.encode("utf-8")
    # lowercasing can EXPAND codepoints ('İ' → 'i' + combining dot), so
    # the caller's pre-lowercase length hint can undercount — size the
    # buffer on the lowered string or tokens silently truncate
    max_out = max(max_out, len(lowered), 1)
    out = np.empty(max_out, np.int32)
    n = lib.tokenize_ids(
        ffi.from_buffer(enc) if enc else ffi.NULL,
        len(enc),
        ffi.cast("int32_t *", ffi.from_buffer(out)),
        max_out,
        n_buckets,
        n_special,
    )
    return out[:n].tolist()


def tokenize_ids_batch_native(
    texts: list[str], max_len: int, n_buckets: int, n_special: int
):
    """Batch tokenize → (ids [n, max_len] int32, counts [n]); None if the
    native kernel is unavailable."""
    import numpy as np

    ffi, lib = get_fasthash()
    if lib is None:
        return None
    encoded = [t.lower().encode("utf-8") for t in texts]
    offsets = np.zeros(len(texts) + 1, np.int32)
    for i, e in enumerate(encoded):
        offsets[i + 1] = offsets[i] + len(e)
    buf = b"".join(encoded) or b"\x00"
    out = np.zeros((len(texts), max_len), np.int32)
    counts = np.zeros(len(texts), np.int32)
    lib.tokenize_ids_batch(
        ffi.from_buffer(buf),
        ffi.cast("const int *", ffi.from_buffer(offsets)),
        len(texts),
        ffi.cast("int32_t *", ffi.from_buffer(out)),
        ffi.cast("int *", ffi.from_buffer(counts)),
        max_len,
        n_buckets,
        n_special,
    )
    return out, counts


def hash_embed_batch_native(texts: list[str], dim: int):
    """Batch feature-hash embed via the C kernel; None if unavailable."""
    import numpy as np

    ffi, lib = get_fasthash()
    if lib is None:
        return None
    encoded = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(texts) + 1, np.int32)
    for i, e in enumerate(encoded):
        offsets[i + 1] = offsets[i] + len(e)
    buf = b"".join(encoded) or b"\x00"
    out = np.zeros((len(texts), dim), np.float32)
    lib.hash_embed_batch(
        ffi.from_buffer(buf),
        ffi.cast("const int *", ffi.from_buffer(offsets)),
        len(texts),
        ffi.cast("float *", ffi.from_buffer(out)),
        dim,
    )
    return out
