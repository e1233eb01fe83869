"""MCP SSE client against a live in-process SSE server, including stream
drops + automatic reconnect (ROADMAP r1 item 4)."""

import asyncio
import json

import tornado.web

from youtu_rag_tpu.tools.mcp_client import MCPSseClient


class SseServer:
    """Minimal legacy HTTP+SSE MCP server. `drop_every` closes the stream
    after every Nth tools/call response to exercise reconnects."""

    def __init__(self, drop_after_calls=None):
        self.queues = []
        self.calls = 0
        self.sessions = 0
        self.drop_after_calls = drop_after_calls or set()

    def app(self):
        server = self

        class Stream(tornado.web.RequestHandler):
            async def get(self):
                server.sessions += 1
                self.set_header("Content-Type", "text/event-stream")
                q = asyncio.Queue()
                server.queues.append(q)
                self.write("event: endpoint\ndata: /msg\n\n")
                await self.flush()
                while True:
                    item = await q.get()
                    if item is None:  # drop the stream
                        break
                    self.write(f"event: message\ndata: {json.dumps(item)}\n\n")
                    await self.flush()

        class Msg(tornado.web.RequestHandler):
            async def post(self):
                msg = json.loads(self.request.body)
                q = server.queues[-1]
                method = msg.get("method")
                if "id" not in msg:  # notification
                    self.set_status(202)
                    return
                if method == "initialize":
                    result = {"serverInfo": {"name": "fake-sse"}}
                elif method == "tools/list":
                    result = {"tools": [{"name": "echo", "description": "", "inputSchema": {}}]}
                elif method == "tools/call":
                    server.calls += 1
                    result = {
                        "content": [{"type": "text", "text": f"call-{server.calls}"}]
                    }
                else:
                    result = {}
                await q.put({"jsonrpc": "2.0", "id": msg["id"], "result": result})
                if method == "tools/call" and server.calls in server.drop_after_calls:
                    await asyncio.sleep(0.05)  # let the response flush first
                    await q.put(None)
                self.set_status(202)

        return tornado.web.Application([(r"/sse", Stream), (r"/msg", Msg)])


def test_sse_roundtrip_and_reconnect():
    async def go():
        server = SseServer(drop_after_calls={1})
        app = server.app()
        sock = app.listen(0)
        port = list(sock._sockets.values())[0].getsockname()[1]

        client = MCPSseClient(
            f"http://127.0.0.1:{port}/sse", timeout=10, reconnect_backoff=0.05
        )
        await client.connect()
        tools = await client.list_tools()
        assert [t["name"] for t in tools] == ["echo"]

        out1 = await client.call_tool("echo", {})
        assert out1 == "call-1"
        # server drops the stream now; the next call rides the reconnect
        await asyncio.sleep(0.3)
        assert client.reconnect_count == 1, client.reconnect_count
        out2 = await client.call_tool("echo", {})
        assert out2 == "call-2"
        assert server.sessions == 2  # one reconnect happened

        await client.close()
        sock.stop()

    asyncio.run(go())


def test_sse_reconnect_budget_spent():
    async def go():
        server = SseServer(drop_after_calls={1})
        app = server.app()
        sock = app.listen(0)
        port = list(sock._sockets.values())[0].getsockname()[1]
        client = MCPSseClient(
            f"http://127.0.0.1:{port}/sse", timeout=2,
            max_reconnects=2, reconnect_backoff=0.03,
        )
        await client.connect()
        await client.call_tool("echo", {})

        # server becomes unreachable for re-opens: every attempt fails
        async def dead_open():
            raise RuntimeError("connection refused")

        client._open_stream = dead_open
        await asyncio.sleep(0.6)  # drop fires, both reconnect attempts fail
        assert client._reconnects == 2 and not client._connected
        try:
            await client.call_tool("echo", {})
            raise AssertionError("expected disconnect error")
        except RuntimeError as e:
            assert "reconnect" in str(e) or "closed" in str(e)
        await client.close()
        sock.stop()

    asyncio.run(go())
