"""Property-based tests (hypothesis) over the engine's host-side
invariants.

SURVEY §4 notes the reference has no fuzzing at all; these cover the
newest hand-rolled data structures where a single bad edge silently
corrupts retrieval: int4 nibble packing, the BM25 inverted index's
mutation bookkeeping, and filter compile-vs-host parity."""

import numpy as np
from hypothesis import given, settings, strategies as st

from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.retrieval.lexical import LexicalInvertedIndex

# keep runs hermetic-fast: small example counts, no deadline (jax warmup
# inside an example would trip the default 200ms deadline)
settings.register_profile("repo", max_examples=40, deadline=None)
settings.load_profile("repo")


# ------------------------------------------------------------- int4 packing


@given(
    st.integers(min_value=1, max_value=16).map(lambda r: r * 8),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_int4_pack_unpack_identity(n_rows, seed):
    """unpack(pack(q)) == q for every int4-representable value grid."""
    from youtu_rag_tpu.ops.topk import unpack_int4

    rng = np.random.default_rng(seed)
    d = 256
    q = rng.integers(-7, 8, size=(n_rows, d)).astype(np.int32)
    half = d // 2
    packed = ((q[:, :half] & 0xF) | ((q[:, half:] & 0xF) << 4)).astype(
        np.uint8
    ).view(np.int8)
    nib = np.asarray(unpack_int4(packed))
    np.testing.assert_array_equal(nib, q.astype(np.int8))


@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_int4_quantize_error_bound(seed):
    """Dequantized values stay within half a quantization step of the
    source for arbitrary (non-degenerate) float rows."""
    from youtu_rag_tpu.ops.topk import quantize_rows_int4, unpack_int4

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((8, 128)).astype(np.float32) * rng.uniform(0.1, 10)
    packed, scales = quantize_rows_int4(x)
    deq = np.asarray(unpack_int4(np.asarray(packed))).astype(np.float32) * np.asarray(
        scales
    )[:, None]
    step = np.abs(x).max(axis=1, keepdims=True) / 7.0
    assert np.all(np.abs(deq - x) <= step * 0.5 + 1e-5)


# ------------------------------------------------------- lexical index fuzz

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "needle42"]


@st.composite
def _ops(draw):
    """A sequence of add/delete/delete_doc operations over a small id space."""
    n = draw(st.integers(2, 12))
    ops = []
    for _ in range(n):
        kind = draw(st.sampled_from(["add", "delete", "delete_doc"]))
        if kind == "add":
            cid = draw(st.integers(0, 9))
            doc = draw(st.sampled_from(["da", "db"]))
            words = draw(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6))
            ops.append(("add", cid, doc, " ".join(words)))
        elif kind == "delete":
            ops.append(("delete", draw(st.integers(0, 9))))
        else:
            ops.append(("delete_doc", draw(st.sampled_from(["da", "db"]))))
    return ops


@given(_ops())
def test_lexical_index_mutation_invariants(ops):
    """After any add/delete sequence: stats agree with a model dict,
    search never surfaces a deleted chunk, and every live chunk with a
    matching term is findable."""
    ix = LexicalInvertedIndex()
    model: dict[str, tuple[str, str]] = {}  # cid -> (doc, content)
    for op in ops:
        if op[0] == "add":
            _, cid, doc, content = op
            key = f"c{cid}"
            ix.add([Chunk(key, doc, content, 0, {})])
            model[key] = (doc, content)
        elif op[0] == "delete":
            key = f"c{op[1]}"
            ix.delete([key])
            model.pop(key, None)
        else:
            doc = op[1]
            ix.delete_by_document(doc)
            model = {k: v for k, v in model.items() if v[0] != doc}

    assert len(ix) == len(model)
    assert ix.stats()["documents"] == len(model)
    # no leaked empty postings
    assert all(plist for plist in ix._postings.values())
    for w in _WORDS:
        hits = {cid for cid, _ in ix.search(w, top_k=20)}
        expect = {k for k, (_, content) in model.items() if w in content.split()}
        assert hits == expect, (w, hits, expect)


# ------------------------------------------------ filter compile parity


@given(
    st.sampled_from(["$eq", "$ne"]),
    st.sampled_from(["red", "green", "blue", ""]),
    st.integers(0, 2**31 - 1),
)
def test_filter_string_parity(op, val, seed):
    """String equality filters (hashed categorical ids) agree with
    host_eval, including the empty string."""
    from youtu_rag_tpu.core.config import IndexConfig
    from youtu_rag_tpu.index.device_index import DeviceVectorIndex
    from youtu_rag_tpu.index.filters import host_eval

    rng = np.random.default_rng(seed)
    filt = {"color": {op: val}}
    palette = ["red", "green", "blue", "", "cyan"]
    chunks = [
        Chunk(f"c{i}", "d", f"t{i}", i, {"color": palette[int(rng.integers(0, 5))]})
        for i in range(16)
    ]
    vecs = rng.standard_normal((16, 32)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ix = DeviceVectorIndex(32, IndexConfig(min_capacity=64, block_rows=32))
    ix.add(chunks, vecs)
    got = ix.search(vecs[:2], top_k=16, filters=filt)
    for qi in range(2):
        got_ids = {c.id for c, _ in got[qi]}
        want_ids = {c.id for c in chunks if host_eval(filt, c.metadata)}
        assert got_ids == want_ids, (filt, got_ids ^ want_ids)


@given(
    st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in"]),
    st.integers(-5, 5),
    st.lists(st.integers(-5, 5), min_size=1, max_size=4),
    st.integers(0, 2**31 - 1),
)
def test_filter_device_vs_host_parity(op, val, in_vals, seed):
    """Compiled device masks agree with host_eval for random numeric
    filters over random metadata rows."""
    from youtu_rag_tpu.core.config import IndexConfig
    from youtu_rag_tpu.index.device_index import DeviceVectorIndex
    from youtu_rag_tpu.index.filters import host_eval

    rng = np.random.default_rng(seed)
    filt = {"x": {op: in_vals if op == "$in" else val}}
    chunks = [
        Chunk(f"c{i}", "d", f"t{i}", i, {"x": int(rng.integers(-5, 6))})
        for i in range(24)
    ]
    vecs = rng.standard_normal((24, 32)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ix = DeviceVectorIndex(32, IndexConfig(min_capacity=64, block_rows=32))
    ix.add(chunks, vecs)
    got = ix.search(vecs[:3], top_k=24, filters=filt)
    for qi in range(3):
        got_ids = {c.id for c, _ in got[qi]}
        want_ids = {c.id for c in chunks if host_eval(filt, c.metadata)}
        assert got_ids == want_ids, (filt, got_ids ^ want_ids)
