"""Element-index schema linking (VERDICT r2 item 4): the idf-weighted
element index picks the right sheet where raw lexical overlap picks a
wrong one (generic-token pile-up)."""

import pandas as pd

from youtu_rag_tpu.integrations.dtr.schema_link import ElementIndex, link_sheets_element
from youtu_rag_tpu.integrations.dtr.smg import link_sheets

QUESTION = "which product had the highest defect count last month"


def _workbook():
    """Six sheets. Every sheet carries the generic tokens (product, month,
    count, last) in its columns; only `quality` has the rare question token
    (defect). Lexical overlap counts raw matches, so the decoys' broader
    generic coverage outscores the one discriminating token."""
    sheets = {}
    generic = {
        "product": ["p1", "p2", "p3"],
        "month": ["jan", "feb", "mar"],
        "last_count": [1, 2, 3],
    }
    for name in ("shipping", "billing", "inventory", "returns", "forecast"):
        df = pd.DataFrame(dict(generic))
        # decoys pile on MORE question-token columns (highest, count, last)
        df["highest_count"] = [4, 5, 6]
        df["last_month_total"] = [7, 8, 9]
        sheets[name] = df
    sheets["quality"] = pd.DataFrame(
        {
            "product": ["p1", "p2", "p3"],
            "month": ["jan", "feb", "mar"],
            "defect": [10, 3, 8],
        }
    )
    return sheets


def test_lexical_overlap_picks_wrong_sheet():
    ranked = link_sheets(QUESTION, _workbook(), top_n=6)
    assert ranked[0][0] != "quality", (
        "fixture no longer adversarial — lexical got it right: " + str(ranked)
    )


def test_element_index_picks_right_sheet():
    ranked = link_sheets_element(QUESTION, _workbook(), top_n=6)
    assert ranked[0][0] == "quality", ranked
    # and the discriminating column is among the matched columns
    assert "defect" in ranked[0][2]


def test_element_index_matched_columns_ranked():
    idx = ElementIndex(_workbook())
    hits = idx.search(QUESTION, top_k=5)
    # the best element comes from `quality`, and its defect column ranks
    # among the top elements overall
    assert hits[0][0]["sheet"] == "quality", hits[:3]
    assert any(
        e["sheet"] == "quality" and e.get("column") == "defect" for e, _ in hits[:3]
    ), hits[:3]


def test_element_index_value_match():
    """A question naming a CELL VALUE (not any column) must pull in the
    sheet holding that value — the element docs embed sampled values."""
    sheets = {
        "a": pd.DataFrame({"city": ["beijing", "shanghai"], "pop": [1, 2]}),
        "b": pd.DataFrame({"city": ["paris", "london"], "pop": [3, 4]}),
    }
    ranked = ElementIndex(sheets).link("population of london", top_n=2)
    assert ranked[0][0] == "b", ranked


def test_contract_matches_lexical_linker():
    ranked = link_sheets_element(QUESTION, _workbook(), top_n=3)
    assert len(ranked) == 3
    for name, score, cols in ranked:
        assert isinstance(name, str) and isinstance(score, float) and isinstance(cols, list)
