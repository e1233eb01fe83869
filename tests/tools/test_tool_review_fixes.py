"""Regression pins for the tools review findings."""

import asyncio

import pytest

from youtu_rag_tpu.core.types import Chunk, RetrievalResult
from youtu_rag_tpu.tools.base import AsyncBaseToolkit, ToolRouter, register_tool
from youtu_rag_tpu.tools.builtin import FileToolkit
from youtu_rag_tpu.tools.file_edit import FileEditToolkit
from youtu_rag_tpu.tools.html_toolkit import HTMLToolkit
from youtu_rag_tpu.tools.kb_search import _format_results


def test_file_toolkit_rejects_sibling_prefix_escape(tmp_path):
    ws = tmp_path / "agent"
    ws.mkdir()
    (tmp_path / "agent-secrets").mkdir()
    (tmp_path / "agent-secrets" / "key.txt").write_text("s3cret")
    tk = FileToolkit({"workspace": str(ws)})
    with pytest.raises(ValueError):
        tk._resolve("../agent-secrets/key.txt")


def test_html_toolkit_contains_filename(tmp_path):
    tk = HTMLToolkit({"output_dir": str(tmp_path / "reports")})
    out = asyncio.run(tk.render_html_report("# hi", filename="../evil.html"))
    assert out.startswith("Error")
    assert not (tmp_path / "evil.html").exists()
    ok = asyncio.run(tk.render_html_report("# hi", filename="good.html"))
    assert "good.html" in ok


def test_file_edit_replaces_single_occurrence(tmp_path):
    tk = FileEditToolkit({"workspace_root": str(tmp_path)})
    f = tmp_path / "x.py"
    f.write_text("a = 1\nb = 1\nc = 1\n")
    diff = "<<<<<<< SEARCH\n= 1\n=======\n= 5\n>>>>>>> REPLACE"
    asyncio.run(tk.edit_file("x.py", diff))
    assert f.read_text() == "a = 5\nb = 1\nc = 1\n"  # only the FIRST site


def test_format_results_truncates_oversized_top_hit():
    big = RetrievalResult(chunk=Chunk("c", "d", "y" * 20000, 0, {}), score=0.9, rank=1)
    out = _format_results([big], max_chars=500)
    assert out and len(out) <= 520  # used to return "" (reads as empty KB)


def test_router_rebuilds_routes_after_build():
    class LateToolkit(AsyncBaseToolkit):
        """Discovers its tools in build() — the MCP pattern."""

        def __init__(self, config=None):
            super().__init__(config)
            self._late = {}

        def get_tools_map_func(self):
            return dict(self._late)

        async def build(self):
            async def late_tool(x: str) -> str:
                return f"late:{x}"

            self._late["late_tool"] = late_tool
            await super().build()

    async def go():
        router = ToolRouter([LateToolkit()])
        assert "late_tool" not in router.tool_names()
        await router.build()
        assert "late_tool" in router.tool_names()
        return await router.call("late_tool", {"x": "ok"})

    assert asyncio.run(go()) == "late:ok"
