"""SPA integrity tests (no JS runtime in this image, so validate what we
can hermetically): static assets serve, every API path the JS calls
matches a registered tornado route, i18n keys resolve in both languages,
and files are brace-balanced (gross syntax guard)."""

import json
import re
from pathlib import Path

import tornado.web
from tornado.testing import AsyncHTTPTestCase

from youtu_rag_tpu.api.app import create_app
from youtu_rag_tpu.api.state import ApiState
from youtu_rag_tpu.core.config import IndexConfig, RAGConfig, VectorStoreConfig

STATIC = Path(__file__).parents[2] / "youtu_rag_tpu" / "api" / "static"
JS_FILES = sorted(STATIC.rglob("*.js"))


def _routes():
    import tempfile

    rag = RAGConfig(vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=128)))
    app = create_app(ApiState(data_dir=tempfile.mkdtemp(prefix="yrt-spa-"), rag_config=rag))
    pats = []
    for rule in app.default_router.rules[0].target.rules:
        pats.append(rule.matcher.regex.pattern)
    return pats


def test_js_api_paths_match_routes():
    """Every fetch/api() URL literal in the SPA resolves to a real route —
    catches frontend/backend drift."""
    pats = _routes()
    called = set()
    for f in JS_FILES:
        text = f.read_text()
        for m in re.findall(r"""[`"'](/(?:api|health|static|ws)[^`"']*)[`"']""", text):
            # template params → a concrete placeholder; strip query strings
            url = re.sub(r"\$\{[^}]*\}", "X", m).split("?")[0]
            called.add(url)
    assert called, "no API calls found in the SPA?"
    misses = []
    for url in sorted(called):
        if not any(re.fullmatch(p.rstrip("$"), url) for p in pats):
            misses.append(url)
    assert not misses, f"SPA calls unrouted paths: {misses}"


def test_js_brace_balance_and_modules():
    # bracket balance via the real lexer (utils/jscheck.py) — a regex-level
    # string stripper misreads regex literals like [^)\s] and [.)]
    from youtu_rag_tpu.utils.jscheck import check_file

    for f in JS_FILES:
        errs = check_file(f)
        assert not errs, (f.name, [str(e) for e in errs])
    app_js = (STATIC / "app.js").read_text()
    for view in ("chat", "kb", "files", "monitor"):
        assert f"./views/{view}.js" in app_js, f"view {view} not wired into the router"


def test_i18n_keys_resolve_both_languages():
    app_js = (STATIC / "app.js").read_text()
    en = dict(re.findall(r'"([\w.]+)":\s*"([^"]*)"', app_js.split("en: {")[1].split("zh: {")[0]))
    zh = dict(re.findall(r'"([\w.]+)":\s*"([^"]*)"', app_js.split("zh: {")[1].split("};")[0]))
    used = set()
    for f in JS_FILES:
        used |= set(re.findall(r'\bt\("([\w.]+)"\)', f.read_text()))
    used |= set(re.findall(r'data-i18n="([\w.]+)"', (STATIC / "index.html").read_text()))
    missing_en = used - set(en)
    missing_zh = used - set(zh)
    assert not missing_en, f"missing en i18n keys: {missing_en}"
    assert not missing_zh, f"missing zh i18n keys: {missing_zh}"


class SpaServeTest(AsyncHTTPTestCase):
    def get_app(self):
        import tempfile

        rag = RAGConfig(vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=128)))
        self.state = ApiState(data_dir=tempfile.mkdtemp(prefix="yrt-spa2-"), rag_config=rag)
        return create_app(self.state)

    def test_index_and_assets_serve(self):
        r = self.fetch("/")
        assert r.code == 200 and b"/static/app.js" in r.body and b"/static/style.css" in r.body
        for path in ("/static/app.js", "/static/style.css",
                     "/static/views/chat.js", "/static/views/kb.js",
                     "/static/views/files.js", "/static/views/monitor.js"):
            rr = self.fetch(path)
            assert rr.code == 200 and len(rr.body) > 500, path

    def test_metadata_csv_roundtrip_shape(self):
        # the Metadata tab's export link returns CSV with the header row
        self.fetch("/api/knowledge-bases", method="POST", body=json.dumps({"name": "spa"}))
        self.fetch("/api/knowledge-bases/spa/build",
                   method="POST", body=json.dumps({"documents": [{"id": "d", "content": "hello spa"}]}))
        r = self.fetch("/api/knowledge-bases/spa/metadata")
        assert r.code == 200 and r.body.startswith(b"chunk_id,document_id")


def test_chat_file_sidebar_contract():
    """The in-chat file sidebar (ref chat.js openChatFileSidebar) is wired:
    chat.js fetches file content by name, renders CSV via the shared
    quote-aware table helper, and the panel's classes are styled."""
    chat = (STATIC / "views" / "chat.js").read_text()
    assert "openFileSidebar" in chat
    assert "/api/files/${encodeURIComponent(name)}" in chat
    assert "csvTable" in chat, "sidebar must reuse the shared CSV renderer"
    # source chip pulls the filename out of the context metadata line
    assert re.search(r"sourceFileOf", chat)
    css = (STATIC / "style.css").read_text()
    for cls in (".file-sidebar", ".file-sidebar-body", ".src-chip"):
        assert cls in css, f"{cls} unstyled"


def test_upload_tasks_persist_contract():
    """In-flight upload cards survive a reload: files.js stores task ids in
    localStorage and resumes polling them on render (ref file-manager.js
    saveUploadTask/getStoredUploadTasks:18-60)."""
    files = (STATIC / "views" / "files.js").read_text()
    assert "localStorage" in files
    assert "getStoredUploadTasks" in files and "removeUploadTask" in files
    # resume loop runs at render time, not only on click
    assert re.search(r"for \(const \{ task_id, filename \} of getStoredUploadTasks\(\)\)", files)


def test_csv_parser_quote_grammar():
    """parseCsv must be quote-aware (ref renderCSVInSidebar grammar):
    assert the implementation handles escaped quotes and embedded
    commas/newlines rather than splitting on ','. The executable coverage
    lives in test_js_transforms.py (jsmini); this pins the grammar's
    load-bearing branches textually as defense in depth."""
    utils = (STATIC / "views" / "transforms.js").read_text()
    body = utils.split("export function parseCsv")[1].split("export function")[0]
    assert "inQuotes" in body
    assert "'\\\"'" in body or '"\\""' in body or "'\"'" in body  # quote char branch
    assert re.search(r"text\[i \+ 1\]", body), "missing doubled-quote escape lookahead"


def test_kb_file_picker_contract():
    """Build-tab source selection goes through the searchable, paginated
    picker modal + selected-files summary (ref knowledge-base-detail.js
    renderFileModalPagination/confirmFileSelection), not a flat checkbox
    harvest of the whole tab."""
    kb = (STATIC / "views" / "kb.js").read_text()
    assert "openFilePicker" in kb and "selectedFiles" in kb
    assert "PICK_PAGE" in kb, "picker must paginate"
    assert 'root.querySelectorAll("input[type=checkbox][value]")' not in kb, \
        "build/save must read the selection set, not scrape tab checkboxes"
    # declared config sources pre-populate the selection
    assert re.search(r"for \(const n of declared\) selectedFiles\.add\(n\)", kb)


def test_agent_kb_gate_contract():
    """Agents whose catalog entry declares requires_kb gate the send button
    until a KB is picked (ref chat.js AGENT_KB_REQUIREMENTS:11-72), and the
    catalog route actually ships the flag."""
    from youtu_rag_tpu.api.app import agent_catalog

    cat = {a["name"]: a for a in agent_catalog()}
    assert cat["kb_search"]["requires_kb"] is True
    assert cat["text2sql"]["requires_kb"] is True
    chat = (STATIC / "views" / "chat.js").read_text()
    assert "requires_kb" in chat and "updateSendGate" in chat
    # IME guard: Enter mid-composition must not submit
    assert "compositionstart" in chat and "isComposing" in chat


class KbCreateOptionsTest(AsyncHTTPTestCase):
    """The create modal's fields land in the KB: description (top-level
    sugar) and storage tier (config override) round-trip through stats."""

    def get_app(self):
        import tempfile

        rag = RAGConfig(vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=128)))
        self.state = ApiState(data_dir=tempfile.mkdtemp(prefix="yrt-spa3-"), rag_config=rag)
        return create_app(self.state)

    def test_description_and_tier_roundtrip(self):
        r = self.fetch("/api/knowledge-bases", method="POST", body=json.dumps({
            "name": "opts", "description": "contract corpus",
            "config": {"vector_store": {"index": {
                "storage_dtype": "int8", "min_capacity": 256, "block_rows": 128}}},
        }))
        assert r.code == 201, r.body
        out = json.loads(self.fetch("/api/knowledge-bases/opts").body)
        assert out["description"] == "contract corpus"
        assert out["storage_dtype"] == "int8"
