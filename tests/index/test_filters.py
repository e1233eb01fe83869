import numpy as np
import pytest

from youtu_rag_tpu.index.filters import FilterError, compile_filter, host_eval
from youtu_rag_tpu.index.metadata import MISSING_I32, MetadataSchema


def _schema_with_rows(rows):
    schema = MetadataSchema(max_columns=8)
    cols = np.asarray([schema.encode_row(m) for m in rows], np.int32)
    return schema, cols


ROWS = [
    {"source": "a.pdf", "page": 1, "ts": 100},
    {"source": "b.pdf", "page": 2, "ts": 200},
    {"source": "a.pdf", "page": 3, "ts": 300},
    {"source": "c.md", "ts": 250},
    {},
]


@pytest.mark.parametrize(
    "filt,expected",
    [
        ({"source": "a.pdf"}, [True, False, True, False, False]),
        ({"source": {"$ne": "a.pdf"}}, [False, True, False, True, False]),
        ({"page": {"$gte": 2}}, [False, True, True, False, False]),
        ({"ts": {"$gte": 150, "$lte": 260}}, [False, True, False, True, False]),
        ({"source": {"$in": ["a.pdf", "c.md"]}}, [True, False, True, True, False]),
        ({"source": {"$nin": ["a.pdf", "c.md"]}}, [False, True, False, False, False]),
        (
            {"$or": [{"page": {"$lt": 2}}, {"ts": {"$gt": 260}}]},
            [True, False, True, False, False],
        ),
        (
            {"$and": [{"source": "a.pdf"}, {"ts": {"$gt": 150}}]},
            [False, False, True, False, False],
        ),
        ({"source": "a.pdf", "page": 1}, [True, False, False, False, False]),
    ],
)
def test_device_mask_matches_host_eval(filt, expected):
    schema, cols = _schema_with_rows(ROWS)
    cf = compile_filter(filt, schema)
    mask = np.asarray(cf.mask(cols))
    assert mask.tolist() == expected
    host = [host_eval(filt, m) for m in ROWS]
    assert host == expected


def test_same_signature_different_constants():
    schema, cols = _schema_with_rows(ROWS)
    f1 = compile_filter({"source": "a.pdf"}, schema)
    f2 = compile_filter({"source": "b.pdf"}, schema)
    assert f1.signature() == f2.signature()
    # evaluating f1's tree with f2's constants gives f2's result
    m = np.asarray(f1.mask(cols, np.asarray(f2.consts)))
    assert m.tolist() == [False, True, False, False, False]


def test_unknown_key_raises():
    schema, cols = _schema_with_rows(ROWS)
    with pytest.raises(FilterError):
        compile_filter({"nope": 1}, schema)


def test_ordered_compare_on_string_raises():
    schema, cols = _schema_with_rows(ROWS)
    with pytest.raises(FilterError):
        compile_filter({"source": {"$gte": "a"}}, schema)


def test_float_ordering_encoding():
    from youtu_rag_tpu.index.metadata import _float_to_ordered_i32

    vals = [-1e9, -3.5, -1.0, -1e-8, 0.0, 1e-8, 2.5, 7.0, 1e9]
    enc = [_float_to_ordered_i32(v) for v in vals]
    assert enc == sorted(enc)
    assert all(e > MISSING_I32 for e in enc)


def test_missing_values_never_match():
    schema, cols = _schema_with_rows(ROWS)
    cf = compile_filter({"page": {"$ne": 99}}, schema)
    mask = np.asarray(cf.mask(cols))
    # rows 3 and 4 have no "page" → excluded even under $ne
    assert mask.tolist() == [True, True, True, False, False]


def test_empty_operator_dict_is_filter_error():
    """{"k": {}} must fail at compile time (FilterError -> host fallback),
    not IndexError mid-search from a zero-child AND node."""
    import pytest as _pytest

    from youtu_rag_tpu.index.filters import FilterError, compile_filter
    from youtu_rag_tpu.index.metadata import MetadataSchema

    schema = MetadataSchema(max_columns=4)
    schema.encode_row({"category": "a"})
    with _pytest.raises(FilterError):
        compile_filter({"category": {}}, schema)
