import asyncio
import sys
import textwrap

import pytest

from youtu_rag_tpu.tools.html_toolkit import HTMLToolkit, markdown_to_html
from youtu_rag_tpu.tools.mcp_client import MCPToolkit
from youtu_rag_tpu.tools.base import ToolkitConfig

# -- HTML -------------------------------------------------------------------


def test_markdown_to_html_elements():
    md = textwrap.dedent(
        """
        # Title
        Some **bold** and `code` text.

        - item one
        - item two

        | a | b |
        |---|---|
        | 1 | 2 |

        ```
        raw code
        ```
        > quoted
        """
    )
    out = markdown_to_html(md)
    assert "<h1>Title</h1>" in out
    assert "<strong>bold</strong>" in out and "<code>code</code>" in out
    assert out.count("<li>") == 2
    assert "<th>a</th>" in out and "<td>1</td>" in out
    assert "<pre><code>" in out and "raw code" in out
    assert "<blockquote>quoted</blockquote>" in out


def test_html_report_file(tmp_path):
    tk = HTMLToolkit(ToolkitConfig(config={"output_dir": str(tmp_path)}))
    out = asyncio.run(
        tk.call_tool("render_html_report", {"markdown": "# Hi\ncontent", "title": "T", "filename": "r.html"})
    )
    assert "r.html" in out
    html = (tmp_path / "r.html").read_text()
    assert "<title>T</title>" in html and "content" in html


def test_html_escapes_script():
    out = markdown_to_html("<script>alert(1)</script>")
    assert "<script>" not in out and "&lt;script&gt;" in out


# -- HiChunk ----------------------------------------------------------------


def test_hichunk_heuristic_markdown():
    from youtu_rag_tpu.ingest.hichunk import HiChunkEngine

    text = (
        "# Introduction\nThis covers the basics. It explains things.\n"
        "## Details\nHere are details. More details follow.\n"
        "# Conclusion\nThe end summary."
    )
    engine = HiChunkEngine()
    md = asyncio.run(engine.to_chunklevel_markdown(text))
    assert md.count("# ") >= 2
    # output feeds the hierarchical splitter
    from youtu_rag_tpu.core.config import ChunkingConfig
    from youtu_rag_tpu.ingest.chunker import HierarchicalMarkdownSplitter

    chunks = HierarchicalMarkdownSplitter(
        ChunkingConfig(chunk_size=200, chunk_overlap=0, strategy="hierarchical")
    ).split_text(md)
    assert chunks and all(c.startswith("#") for c in chunks)


def test_hichunk_windowing_long_text():
    from youtu_rag_tpu.ingest.hichunk import HiChunkEngine, split_sentences

    text = " ".join(f"Sentence number {i} is here." for i in range(300))
    engine = HiChunkEngine(window_size=600)
    sentences, points = asyncio.run(engine.chunk_points(text))
    assert len(sentences) == 300
    assert points  # heuristic fallback produced chunk starts
    assert all(0 <= p.line < 300 for p in points)


def test_split_sentences_caps_length():
    from youtu_rag_tpu.ingest.hichunk import split_sentences

    s = split_sentences("x" * 1000, line_max_len=256)
    assert all(len(p) <= 256 for p in s)
    assert sum(len(p) for p in s) == 1000


# -- MCP --------------------------------------------------------------------

MCP_SERVER = r'''
import json, sys

def reply(obj):
    sys.stdout.write(json.dumps(obj) + "\n")
    sys.stdout.flush()

for line in sys.stdin:
    msg = json.loads(line)
    m, rid = msg.get("method"), msg.get("id")
    if m == "initialize":
        reply({"jsonrpc": "2.0", "id": rid, "result": {"protocolVersion": "2024-11-05",
               "serverInfo": {"name": "demo", "version": "0"}, "capabilities": {}}})
    elif m == "tools/list":
        reply({"jsonrpc": "2.0", "id": rid, "result": {"tools": [
            {"name": "add", "description": "Add two numbers",
             "inputSchema": {"type": "object", "properties": {"a": {"type": "integer"},
              "b": {"type": "integer"}}, "required": ["a", "b"]}},
            {"name": "fail", "description": "Always errors",
             "inputSchema": {"type": "object", "properties": {}}}]}})
    elif m == "tools/call":
        name = msg["params"]["name"]
        if name == "add":
            args = msg["params"]["arguments"]
            reply({"jsonrpc": "2.0", "id": rid, "result": {"content": [
                {"type": "text", "text": str(args["a"] + args["b"])}]}})
        else:
            reply({"jsonrpc": "2.0", "id": rid, "result": {"isError": True,
                   "content": [{"type": "text", "text": "boom"}]}})
'''


def _mcp_toolkit(tmp_path, **extra):
    server = tmp_path / "server.py"
    server.write_text(MCP_SERVER)
    return MCPToolkit(
        ToolkitConfig(
            mode="mcp",
            config={"command": sys.executable, "args": [str(server)]},
            **extra,
        )
    )


def test_mcp_list_and_call(tmp_path):
    tk = _mcp_toolkit(tmp_path)

    async def go():
        await tk.build()
        schemas = tk.get_tools_in_openai()
        out = await tk.call_tool("add", {"a": 20, "b": 22})
        err = await tk.call_tool("fail", {})
        await tk.cleanup()
        return schemas, out, err

    schemas, out, err = asyncio.run(go())
    names = {s["function"]["name"] for s in schemas}
    assert names == {"add", "fail"}
    assert out == "42"
    assert err.startswith("Error: boom")


def test_mcp_activated_tools_filter(tmp_path):
    tk = _mcp_toolkit(tmp_path, activated_tools=["add"])

    async def go():
        await tk.build()
        names = {s["function"]["name"] for s in tk.get_tools_in_openai()}
        await tk.cleanup()
        return names

    assert asyncio.run(go()) == {"add"}


class McpHttpTest(AsyncHTTPTestCase := __import__("tornado.testing", fromlist=["AsyncHTTPTestCase"]).AsyncHTTPTestCase):
    """streamable-http MCP transport against a tornado JSON-RPC endpoint."""

    def get_app(self):
        import tornado.web

        class Rpc(tornado.web.RequestHandler):
            def post(self):
                import json as _json

                msg = _json.loads(self.request.body)
                m, rid = msg.get("method"), msg.get("id")
                self.set_header("Mcp-Session-Id", "sess-1")
                if m == "initialize":
                    self.write({"jsonrpc": "2.0", "id": rid, "result": {
                        "protocolVersion": "2024-11-05",
                        "serverInfo": {"name": "http-demo", "version": "0"},
                        "capabilities": {}}})
                elif m == "tools/list":
                    self.write({"jsonrpc": "2.0", "id": rid, "result": {"tools": [
                        {"name": "mul", "description": "Multiply",
                         "inputSchema": {"type": "object", "properties": {
                             "a": {"type": "integer"}, "b": {"type": "integer"}},
                             "required": ["a", "b"]}}]}})
                elif m == "tools/call":
                    args = msg["params"]["arguments"]
                    # reply as a one-shot SSE stream to exercise that path
                    self.set_header("Content-Type", "text/event-stream")
                    import json as _j

                    self.write("data: " + _j.dumps({
                        "jsonrpc": "2.0", "id": rid,
                        "result": {"content": [{"type": "text", "text": str(args["a"] * args["b"])}]},
                    }) + "\n\n")
                else:
                    self.set_status(204)

        return tornado.web.Application([(r"/mcp", Rpc)])

    def test_http_transport_roundtrip(self):
        import asyncio as _aio

        from youtu_rag_tpu.tools.base import ToolkitConfig
        from youtu_rag_tpu.tools.mcp_client import MCPToolkit

        url = f"http://127.0.0.1:{self.get_http_port()}/mcp"
        tk = MCPToolkit(ToolkitConfig(mode="mcp", config={"url": url}))

        async def go():
            await tk.build()
            names = {s["function"]["name"] for s in tk.get_tools_in_openai()}
            out = await tk.call_tool("mul", {"a": 6, "b": 7})
            return names, out, tk.client._session_id

        names, out, sid = self.io_loop.run_sync(go)
        assert names == {"mul"}
        assert out == "42"
        assert sid == "sess-1"


class McpSseTest(AsyncHTTPTestCase):
    """Legacy HTTP+SSE MCP transport: endpoint event, POST 202, responses
    pushed over the long-lived stream."""

    def get_app(self):
        import json as _json
        import tornado.web

        streams = {}

        class Sse(tornado.web.RequestHandler):
            async def get(self):
                self.set_header("Content-Type", "text/event-stream")
                sid = "s1"
                streams[sid] = self
                self.write(f"event: endpoint\ndata: /messages?session={sid}\n\n")
                await self.flush()
                self._done = tornado.locks.Event()
                await self._done.wait()

            async def push(self, msg):
                self.write("event: message\ndata: " + _json.dumps(msg) + "\n\n")
                await self.flush()

        class Messages(tornado.web.RequestHandler):
            async def post(self):
                msg = _json.loads(self.request.body)
                m, rid = msg.get("method"), msg.get("id")
                self.set_status(202)
                self.finish()
                if rid is None:  # notification
                    return
                stream = streams["s1"]
                if m == "initialize":
                    await stream.push({"jsonrpc": "2.0", "id": rid, "result": {
                        "protocolVersion": "2024-11-05",
                        "serverInfo": {"name": "sse-demo", "version": "0"},
                        "capabilities": {}}})
                elif m == "tools/list":
                    await stream.push({"jsonrpc": "2.0", "id": rid, "result": {"tools": [
                        {"name": "sub", "description": "Subtract",
                         "inputSchema": {"type": "object", "properties": {
                             "a": {"type": "integer"}, "b": {"type": "integer"}},
                             "required": ["a", "b"]}}]}})
                elif m == "tools/call":
                    args = msg["params"]["arguments"]
                    await stream.push({"jsonrpc": "2.0", "id": rid, "result": {
                        "content": [{"type": "text", "text": str(args["a"] - args["b"])}]}})

        import tornado.locks

        return tornado.web.Application([(r"/sse", Sse), (r"/messages", Messages)])

    def test_sse_transport_roundtrip(self):
        from youtu_rag_tpu.tools.base import ToolkitConfig
        from youtu_rag_tpu.tools.mcp_client import MCPSseClient, MCPToolkit

        url = f"http://127.0.0.1:{self.get_http_port()}/sse"
        tk = MCPToolkit(ToolkitConfig(mode="mcp", config={"url": url}))
        assert isinstance(tk.client, MCPSseClient)  # inferred from /sse path

        async def go():
            await tk.build()
            names = {s["function"]["name"] for s in tk.get_tools_in_openai()}
            out = await tk.call_tool("sub", {"a": 50, "b": 8})
            await tk.cleanup()
            return names, out

        names, out = self.io_loop.run_sync(go)
        assert names == {"sub"}
        assert out == "42"
        # endpoint URL resolved relative to the SSE url
        assert tk.client._endpoint.endswith("/messages?session=s1")
