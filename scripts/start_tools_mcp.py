#!/usr/bin/env python
"""Expose builtin toolkits as an MCP server — stdio or HTTP+SSE
(ref: scripts/utils/start_tools_mcp.py serving toolkits over MCP).

    python scripts/start_tools_mcp.py --toolkits tabular codesnip
    python scripts/start_tools_mcp.py --transport sse --port 8765

Speaks JSON-RPC 2.0: initialize, tools/list, tools/call — the same
protocol slice youtu_rag_tpu.tools.mcp_client consumes, so the round-trip
(our client ↔ our server) is fully self-hosted over either transport.
The SSE mode serves GET /sse (endpoint event + message stream) and
POST /messages, matching MCPSseClient's legacy-profile expectations."""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


async def handle_message(msg: dict, router, schemas) -> dict | None:
    """One JSON-RPC message → response dict (None for notifications)."""
    method, rid = msg.get("method"), msg.get("id")
    if rid is None:
        return None
    if method == "initialize":
        return {
            "jsonrpc": "2.0",
            "id": rid,
            "result": {
                "protocolVersion": "2024-11-05",
                "serverInfo": {"name": "youtu-rag-tpu-tools", "version": "0.1.0"},
                "capabilities": {"tools": {}},
            },
        }
    if method == "tools/list":
        return {
            "jsonrpc": "2.0",
            "id": rid,
            "result": {
                "tools": [
                    {
                        "name": s["function"]["name"],
                        "description": s["function"]["description"],
                        "inputSchema": s["function"]["parameters"],
                    }
                    for s in schemas
                ]
            },
        }
    if method == "tools/call":
        params = msg.get("params", {})
        out = await router.call(params.get("name", ""), params.get("arguments", {}))
        return {
            "jsonrpc": "2.0",
            "id": rid,
            "result": {
                "isError": out.startswith("Error"),
                "content": [{"type": "text", "text": out}],
            },
        }
    return {"jsonrpc": "2.0", "id": rid, "error": {"code": -32601, "message": f"unknown method {method}"}}


async def serve_stdio(router, schemas) -> None:
    loop = asyncio.get_event_loop()
    while True:
        line = await loop.run_in_executor(None, sys.stdin.readline)
        if not line:
            break
        try:
            msg = json.loads(line)
        except json.JSONDecodeError:
            continue
        resp = await handle_message(msg, router, schemas)
        if resp is not None:
            sys.stdout.write(json.dumps(resp) + "\n")
            sys.stdout.flush()


async def serve_sse(router, schemas, port: int) -> None:
    import tornado.locks
    import tornado.web

    streams: dict[str, "SseHandler"] = {}

    class SseHandler(tornado.web.RequestHandler):
        async def get(self):
            self.set_header("Content-Type", "text/event-stream")
            self.set_header("Cache-Control", "no-cache")
            sid = uuid.uuid4().hex[:12]
            streams[sid] = self
            self._closed = tornado.locks.Event()
            self.write(f"event: endpoint\ndata: /messages?session={sid}\n\n")
            await self.flush()
            try:
                await self._closed.wait()
            finally:
                streams.pop(sid, None)

        def on_connection_close(self):
            if hasattr(self, "_closed"):
                self._closed.set()

        async def push(self, msg: dict) -> None:
            self.write("event: message\ndata: " + json.dumps(msg) + "\n\n")
            await self.flush()

    class MessagesHandler(tornado.web.RequestHandler):
        async def post(self):
            sid = self.get_query_argument("session", "")
            stream = streams.get(sid)
            if stream is None:
                self.set_status(404)
                self.finish({"error": f"unknown session {sid!r}"})
                return
            try:
                msg = json.loads(self.request.body)
            except json.JSONDecodeError:
                self.set_status(400)
                self.finish({"error": "invalid JSON"})
                return
            self.set_status(202)
            self.finish()
            resp = await handle_message(msg, router, schemas)
            if resp is not None:
                await stream.push(resp)

    app = tornado.web.Application([(r"/sse", SseHandler), (r"/messages", MessagesHandler)])
    app.listen(port)
    print(f"MCP SSE server on :{port} ({len(schemas)} tools)", flush=True)
    await asyncio.Event().wait()


async def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--toolkits", nargs="+", default=["tabular", "codesnip", "file"])
    p.add_argument("--transport", choices=["stdio", "sse"], default="stdio")
    p.add_argument("--port", type=int, default=8765)
    args = p.parse_args()

    from youtu_rag_tpu.tools import get_toolkit
    from youtu_rag_tpu.tools.base import ToolRouter

    router = ToolRouter([get_toolkit(name) for name in args.toolkits])
    await router.build()
    schemas = router.schemas()

    if args.transport == "sse":
        await serve_sse(router, schemas, args.port)
    else:
        await serve_stdio(router, schemas)


if __name__ == "__main__":
    asyncio.run(main())
