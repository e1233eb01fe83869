"""SPA runtime smoke without a browser (VERDICT r2 item 10): every shipped
JS file passes the lexical gate, every view file is referenced from the
app shell, and deliberately broken fixtures fail the gate."""

import pathlib

from youtu_rag_tpu.utils.jscheck import check_file, check_js, check_modules, module_exports

STATIC = pathlib.Path(__file__).resolve().parents[2] / "youtu_rag_tpu" / "api" / "static"


def test_all_shipped_js_passes_gate():
    js_files = sorted(STATIC.rglob("*.js"))
    assert js_files, "SPA js files missing"
    for f in js_files:
        errs = check_file(f)
        assert not errs, f"{f.name}: {[str(e) for e in errs]}"


def test_views_are_referenced_and_served():
    """No orphan modules: every shipped view file is reachable from the app
    shell directly or via an import from another shipped JS file."""
    index = (STATIC / "index.html").read_text(encoding="utf-8")
    app_js = (STATIC / "app.js").read_text(encoding="utf-8")
    assert "app.js" in index
    for view in sorted((STATIC / "views").glob("*.js")):
        name = f"views/{view.name}"
        referenced = name in index or name in app_js or view.stem in app_js
        if not referenced:  # shared modules are imported by sibling views
            referenced = any(
                f"./{view.name}" in other.read_text(encoding="utf-8")
                for other in (STATIC / "views").glob("*.js")
                if other != view
            )
        assert referenced, f"{name} shipped but never referenced from the app shell"


def test_module_graph_resolves():
    """Every relative named import across the SPA resolves to a real export
    in the target module (catches typo'd imports the lexer can't)."""
    errs = check_modules(STATIC)
    assert not errs, [str(e) for e in errs]


def test_module_exports_parsing():
    src = (
        "export function foo() {}\nexport async function bar() {}\n"
        "export const baz = 1;\nexport class Qux {}\n"
        "const hid = 2;\nexport { hid as vis, other };\nexport default foo;\n"
    )
    assert module_exports(src) == {"foo", "bar", "baz", "Qux", "vis", "other", "default"}


def test_module_graph_line_numbers_survive_block_comments(tmp_path):
    (tmp_path / "lib.js").write_text("export function real() {}\n")
    (tmp_path / "a.js").write_text(
        "/* one\ntwo\nthree */\n" + 'import { fake } from "./lib.js";\n'
    )
    errs = check_modules(tmp_path)
    assert errs and errs[0].line == 4  # the import's real line, not shifted


def test_module_graph_catches_bad_import(tmp_path):
    (tmp_path / "lib.js").write_text("export function real() {}\n")
    (tmp_path / "a.js").write_text('import { real, fake } from "./lib.js";\nreal();\n')
    (tmp_path / "b.js").write_text('import { x } from "./missing.js";\n')
    msgs = [str(e) for e in check_modules(tmp_path)]
    assert any("'fake' is not exported" in m for m in msgs)
    assert any("missing module" in m for m in msgs)
    assert not any("'real'" in m for m in msgs)


def test_gate_catches_broken_js():
    bad = [
        "function f() { if (x) { return 1; }\n",  # unclosed brace
        "const s = 'oops\nconst t = 1;",  # unterminated '
        "const t = `hello ${name}",  # unterminated template
        "let a = (1 + [2, 3)];",  # mismatched brackets
        "/* comment never ends",  # unterminated comment
        "const r = /abc;",  # unterminated regex
        "}",  # stray close
    ]
    for src in bad:
        assert check_js(src), f"gate missed: {src!r}"


def test_gate_accepts_tricky_valid_js():
    good = [
        "const r = /[a-z)]+/g; const d = a / b / c;",  # regex w/ bracket
        'const s = "a\\"b" + \'c\\\'d\';',  # escaped quotes
        "const t = `x ${ {a: `${y}`} } z`;",  # nested template
        "// comment with ( unbalanced\nlet x = 1;",
        "if (a) /re/.test(b);",
        "const obj = {a: [1, 2, {b: (3)}]};",
        "return /x/.test(s) ? 1 : 2;",
    ]
    for src in good:
        errs = check_js(src)
        assert not errs, f"false positive on {src!r}: {[str(e) for e in errs]}"
