"""Streaming build concurrent with query traffic (BASELINE config[4]):
index growth must not corrupt in-flight searches."""

import asyncio
import sys

import numpy as np
import pytest

from youtu_rag_tpu.core.config import IndexConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.index.device_index import DeviceVectorIndex


def test_interleaved_add_search(rng, unit_vectors):
    d = 32
    idx = DeviceVectorIndex(d, IndexConfig(min_capacity=128, block_rows=64))
    all_vecs = unit_vectors(rng, 520, d)
    idx.add([Chunk(f"c{i}", "doc", f"t{i}", i) for i in range(20)], all_vecs[:20])

    async def writer():
        for batch in range(20, 520, 50):
            vecs = all_vecs[batch : batch + 50]
            chunks = [Chunk(f"c{i}", "doc", f"t{i}", i) for i in range(batch, batch + 50)]
            await asyncio.to_thread(idx.add, chunks, vecs)
            await asyncio.sleep(0)

    errors = []

    async def reader():
        q = unit_vectors(rng, 2, d)
        for _ in range(30):
            try:
                hits = await asyncio.to_thread(idx.search, q, 5)
                for h in hits:
                    for c, s in h:
                        assert c is not None and np.isfinite(s)
            except Exception as e:  # noqa: BLE001
                errors.append(e)
            await asyncio.sleep(0)

    async def go():
        await asyncio.gather(writer(), reader(), reader())

    asyncio.run(go())
    assert not errors
    assert idx.count() == 520
    # every vector findable after the dust settles
    hits = idx.search(all_vecs[519][None], top_k=1)[0]
    assert hits[0][0].id == "c519"


def test_search_during_delete(rng, unit_vectors):
    d = 32
    idx = DeviceVectorIndex(d, IndexConfig(min_capacity=256, block_rows=64))
    vecs = unit_vectors(rng, 200, d)
    idx.add([Chunk(f"c{i}", f"d{i%10}", f"t{i}", i) for i in range(200)], vecs)

    async def deleter():
        for doc in range(0, 5):
            await asyncio.to_thread(idx.delete_by_document_id, f"d{doc}")
            await asyncio.sleep(0)

    async def reader():
        q = unit_vectors(rng, 1, d)
        for _ in range(20):
            hits = await asyncio.to_thread(idx.search, q, 10)
            for c, s in hits[0]:
                assert c is not None  # tombstoned rows never surface as None
            await asyncio.sleep(0)

    async def go():
        await asyncio.gather(deleter(), reader())

    asyncio.run(go())
    assert idx.count() == 100


def test_mcp_server_script_roundtrip(tmp_path):
    """Our MCP client against our MCP server script — full protocol loop."""
    import os

    from youtu_rag_tpu.tools.base import ToolkitConfig
    from youtu_rag_tpu.tools.mcp_client import MCPToolkit

    script = os.path.join(os.path.dirname(__file__), "..", "scripts", "start_tools_mcp.py")
    tk = MCPToolkit(
        ToolkitConfig(
            mode="mcp",
            config={
                "command": sys.executable,
                "args": [script, "--toolkits", "codesnip"],
                "timeout": 60.0,
            },
        )
    )

    async def go():
        await tk.build()
        names = {s["function"]["name"] for s in tk.get_tools_in_openai()}
        out = await tk.call_tool("run_snippet", {"code": "print(7*6)"})
        await tk.cleanup()
        return names, out

    names, out = asyncio.run(go())
    assert "run_snippet" in names
    assert out == "42"
