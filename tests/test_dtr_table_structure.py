"""Messy-table structuring (integrations/dtr/table_structure.py) — the
DataFrame-level counterpart of the reference's MetaExtractor
(meta_extractor.py:50-158) + SmartTableProcessor (smart_table_processor.py).
"""

import numpy as np
import pandas as pd
import pytest

from youtu_rag_tpu.integrations.dtr.loader import load_sheets, profile_workbook, workbook_brief
from youtu_rag_tpu.integrations.dtr.table_structure import (
    clean_frame,
    detect_header_end,
    fill_down_group_labels,
    structure_sheet,
)


def _raw(rows):
    return pd.DataFrame(rows)


# ------------------------------------------------------------ header end


def test_header_end_single_row():
    df = _raw([["year", "count"], [2020, 5], [2021, 7]])
    assert detect_header_end(df) == 1


def test_header_end_multi_row():
    df = _raw(
        [
            ["Employment", None, "Population", None],
            ["Employed", "Unemployed", "Urban", "Rural"],
            [100, 5, 70, 30],
            [110, 4, 72, 28],
        ]
    )
    assert detect_header_end(df) == 2


def test_header_end_headerless_numeric():
    df = _raw([[1, 2, 3], [4, 5, 6]])
    assert detect_header_end(df) == 0


def test_header_end_all_text_falls_back_to_one():
    df = _raw([["name", "city"], ["ann", "rome"], ["bo", "oslo"]])
    assert detect_header_end(df) == 1


def test_header_end_comma_numbers_count_as_numeric():
    df = _raw([["metric", "value"], ["a", "1,234"], ["b", "5,678"]])
    # row 1 has 1 numeric of 2 → not data by ratio alone; add a column
    df2 = _raw([["m", "v", "w"], ["a", "1,234", "9,0"], ["b", "5,678", "1"]])
    assert detect_header_end(df2) == 1
    assert detect_header_end(df) == 1


# ------------------------------------------------------------- structure


def test_multi_row_header_composite_names_and_triplets():
    df = _raw(
        [
            ["Employment Status", None, "Region", None],
            ["Employed", "Unemployed", "Urban", "Rural"],
            [100, 5, 70, 30],
            [110, 4, 72, 28],
        ]
    )
    out, ts = structure_sheet(df)
    assert list(out.columns) == [
        "Employment Status_Employed",
        "Employment Status_Unemployed",
        "Region_Urban",
        "Region_Rural",
    ]
    assert '(table, has_column_header, "Employment Status")' in ts.triplets
    assert '("Employment Status", has_child, "Employed")' in ts.triplets
    assert '("Region", has_child, "Rural")' in ts.triplets
    assert out.shape == (2, 4)
    assert out["Employment Status_Employed"].tolist() == [100, 110]


def test_banner_row_becomes_title_not_column():
    df = _raw(
        [
            ["ANNUAL SURVEY 2024", None, None],
            ["year", "count", "rate"],
            [2020, 5, 0.1],
            [2021, 7, 0.2],
            [2022, 9, 0.3],
        ]
    )
    out, ts = structure_sheet(df)
    assert ts.title == "ANNUAL SURVEY 2024"
    assert list(out.columns) == ["year", "count", "rate"]
    # year-like annotation replaces the ref's forced rename
    assert any("year-like" in n for n in ts.notes)


def test_headerless_gets_synthetic_names():
    df = _raw([[1, 2], [3, 4]])
    out, ts = structure_sheet(df)
    assert list(out.columns) == ["col_0", "col_1"]
    assert ts.header_rows == 0


def test_duplicate_names_are_uniqued():
    df = _raw([["total", "total", "total"], [1, 2, 3]])
    out, _ = structure_sheet(df)
    assert list(out.columns) == ["total", "total_1", "total_2"]


def test_parent_not_overfilled_past_spacer_column():
    # spacer column (blank at every level) must break the parent span
    df = _raw(
        [
            ["Group", None, None, "Other"],
            ["a", "b", None, "x"],
            [1, 2, None, 3],
            [4, 5, None, 6],
        ]
    )
    out, ts = structure_sheet(df)
    # the all-empty column is dropped by clean_frame; Other is its own root
    assert "Other_x" in list(out.columns)
    assert '("Group", has_child, "x")' not in ts.triplets


# ----------------------------------------------------------------- clean


def test_clean_frame_coerces_comma_numbers():
    df = pd.DataFrame({"v": ["1,234", "5,678", "bad"]})
    out = clean_frame(df)
    assert out["v"].iloc[0] == 1234.0
    assert np.isnan(out["v"].iloc[2])


def test_clean_frame_keeps_mostly_text_columns():
    df = pd.DataFrame({"v": ["a", "b", "3"]})
    out = clean_frame(df)
    assert out["v"].tolist() == ["a", "b", "3"]


def test_fill_down_group_labels():
    df = pd.DataFrame(
        {
            "group": ["A", None, None, "B", None, None],
            "val": [1, 2, 3, 4, 5, 6],
        }
    )
    out, filled = fill_down_group_labels(df)
    assert filled == ["group"]
    assert out["group"].tolist() == ["A", "A", "A", "B", "B", "B"]


def test_fill_down_skips_sparse_text():
    # >90% blank or first-row blank → not a group label
    df = pd.DataFrame({"c": [None, "x", None, None, None, None, None, None, None, None, None], "v": range(11)})
    out, filled = fill_down_group_labels(df)
    assert filled == []


# ------------------------------------------------------------ loader wire


def test_load_sheets_structures_multirow_csv(tmp_path):
    p = tmp_path / "report.csv"
    p.write_text(
        "QUARTERLY REPORT,,,\n"
        "Sales,,Costs,\n"
        "Domestic,Export,Fixed,Variable\n"
        "100,20,30,\"1,000\"\n"
        "110,25,31,\"1,100\"\n"
    )
    sheets = load_sheets(str(p))
    df = sheets["Sheet1"]
    assert list(df.columns) == ["Sales_Domestic", "Sales_Export", "Costs_Fixed", "Costs_Variable"]
    assert df["Costs_Variable"].tolist() == [1000.0, 1100.0]
    ts = df.attrs["structure"]
    assert ts.title == "QUARTERLY REPORT"
    profs = profile_workbook(sheets)
    brief = workbook_brief(profs)
    assert "QUARTERLY REPORT" in brief and "has_child" in brief


def test_load_sheets_plain_csv_fast_path(tmp_path):
    p = tmp_path / "plain.csv"
    p.write_text("name,qty\napple,3\npear,4\n")
    sheets = load_sheets(str(p))
    df = sheets["Sheet1"]
    assert list(df.columns) == ["name", "qty"]
    assert "structure" not in df.attrs  # untouched by the structurer


def test_load_sheets_headerless_csv(tmp_path):
    p = tmp_path / "nums.csv"
    p.write_text("1,2\n3,4\n")
    sheets = load_sheets(str(p))
    df = sheets["Sheet1"]
    assert list(df.columns) == ["col_0", "col_1"]
    assert df.attrs["synthetic_header"]


@pytest.mark.parametrize("blank_rows", [0, 2])
def test_leading_blank_rows_are_skipped(tmp_path, blank_rows):
    p = tmp_path / "padded.csv"
    p.write_text(",,\n" * blank_rows + "a,b,c\n1,2,3\n4,5,6\n")
    sheets = load_sheets(str(p))
    df = sheets["Sheet1"]
    assert list(df.columns)[:3] == ["a", "b", "c"]
    assert len(df) == 2
