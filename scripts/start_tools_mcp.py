#!/usr/bin/env python
"""Expose builtin toolkits as an MCP stdio server
(ref: scripts/utils/start_tools_mcp.py serving toolkits over MCP).

    python scripts/start_tools_mcp.py --toolkits tabular codesnip

Speaks JSON-RPC 2.0 on stdio: initialize, tools/list, tools/call — the
same protocol slice youtu_rag_tpu.tools.mcp_client consumes, so the
round-trip (our client ↔ our server) is fully self-hosted."""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


async def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--toolkits", nargs="+", default=["tabular", "codesnip", "file"])
    args = p.parse_args()

    from youtu_rag_tpu.tools import get_toolkit
    from youtu_rag_tpu.tools.base import ToolRouter

    router = ToolRouter([get_toolkit(name) for name in args.toolkits])
    await router.build()
    schemas = router.schemas()

    def reply(obj: dict) -> None:
        sys.stdout.write(json.dumps(obj) + "\n")
        sys.stdout.flush()

    loop = asyncio.get_event_loop()
    while True:
        line = await loop.run_in_executor(None, sys.stdin.readline)
        if not line:
            break
        try:
            msg = json.loads(line)
        except json.JSONDecodeError:
            continue
        method, rid = msg.get("method"), msg.get("id")
        if method == "initialize":
            reply(
                {
                    "jsonrpc": "2.0",
                    "id": rid,
                    "result": {
                        "protocolVersion": "2024-11-05",
                        "serverInfo": {"name": "youtu-rag-tpu-tools", "version": "0.1.0"},
                        "capabilities": {"tools": {}},
                    },
                }
            )
        elif method == "tools/list":
            reply(
                {
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
            )
        elif method == "tools/call":
            params = msg.get("params", {})
            out = await router.call(params.get("name", ""), params.get("arguments", {}))
            is_err = out.startswith("Error")
            reply(
                {
                    "jsonrpc": "2.0",
                    "id": rid,
                    "result": {
                        "isError": is_err,
                        "content": [{"type": "text", "text": out}],
                    },
                }
            )
        elif rid is not None:
            reply({"jsonrpc": "2.0", "id": rid, "error": {"code": -32601, "message": f"unknown method {method}"}})


if __name__ == "__main__":
    asyncio.run(main())
