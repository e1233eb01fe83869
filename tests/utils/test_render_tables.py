"""benchmarks/README.md derived tables must match the committed JSON
reports (VERDICT r3 weak #5 / item 9: hand-maintained tables drifted one
commit after regeneration — now a gate, not a convention)."""

import importlib.util
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[2]


def _mod():
    spec = importlib.util.spec_from_file_location(
        "render_bench_tables", ROOT / "scripts" / "analysis" / "render_bench_tables.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_readme_tables_match_reports():
    m = _mod()
    text = (ROOT / "benchmarks" / "README.md").read_text()
    new, unknown = m.render(text)
    assert not unknown, f"unknown gen blocks: {unknown}"
    assert new == text, (
        "benchmarks/README.md tables drift from the JSON reports — run "
        "python scripts/analysis/render_bench_tables.py and commit"
    )


def test_tampered_table_fails(tmp_path):
    m = _mod()
    text = (ROOT / "benchmarks" / "README.md").read_text()
    assert "<!-- gen:quality_niah -->" in text
    tampered = text.replace("0.402", "0.999", 1)
    assert tampered != text, "expected a rendered niah value in the README"
    new, _ = m.render(tampered)
    assert new != tampered, "renderer failed to detect a tampered table value"


def test_every_quality_block_renders_rows():
    m = _mod()
    for name, fn in m.renderers().items():
        out = fn()
        if out.startswith("("):  # report not present in this checkout
            continue
        assert out.count("\n") >= 2, f"block {name} rendered no rows:\n{out}"
