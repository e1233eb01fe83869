import asyncio
import time

from youtu_rag_tpu.memory.store import MemoryNode, MemoryVectorStore
from youtu_rag_tpu.memory.toolkit import VectorMemoryToolkit
from youtu_rag_tpu.models.embedder import HashEmbedder


def _store():
    return MemoryVectorStore(HashEmbedder(dim=128))


def test_add_and_search_by_type():
    s = _store()

    async def go():
        await s.add(MemoryNode.new("u1", "semantic", "the database password policy requires rotation"))
        await s.add(MemoryNode.new("u1", "episodic", "yesterday we discussed kubernetes deployments"))
        await s.add(MemoryNode.new("u2", "semantic", "other user's fact about databases"))
        hits = await s.search_memories("u1", "database policy", memory_types=["semantic"])
        return hits

    hits = asyncio.run(go())
    assert hits
    assert hits[0][0].user_id == "u1"
    assert hits[0][0].memory_type == "semantic"
    assert "password policy" in hits[0][0].content


def test_importance_and_recency_weighting():
    s = _store()

    async def go():
        old = MemoryNode.new("u", "semantic", "shared topic alpha beta gamma", importance=0.1)
        old.created_at = time.time() - 30 * 86400
        new = MemoryNode.new("u", "semantic", "shared topic alpha beta gamma!", importance=0.9)
        await s.add(old)
        await s.add(new)
        return await s.search_memories("u", "shared topic alpha beta gamma")

    hits = asyncio.run(go())
    assert hits[0][0].importance == 0.9  # fresher + more important wins


def test_working_memory_session_scoped():
    s = _store()

    async def go():
        for i in range(5):
            n = MemoryNode.new("u", "working", f"turn {i}", session_id="s1")
            n.created_at = time.time() + i
            await s.add(n)
        await s.add(MemoryNode.new("u", "working", "other session", session_id="s2"))
        return await s.get_working_memory("u", "s1", last_n=3)

    wm = asyncio.run(go())
    assert [m.content for m in wm] == ["turn 2", "turn 3", "turn 4"]


def test_procedural_cleanup():
    s = _store()

    async def go():
        bad = MemoryNode.new("u", "procedural", "bad skill")
        bad.use_count, bad.success_count = 5, 0
        good = MemoryNode.new("u", "procedural", "good skill")
        good.use_count, good.success_count = 5, 5
        await s.add(bad)
        await s.add(good)
        removed = await s.cleanup_procedural("u")
        return removed, s.stats("u")

    removed, stats = asyncio.run(go())
    assert removed == 1
    assert stats["procedural"] == 1


def test_toolkit_roundtrip_and_context():
    tk = VectorMemoryToolkit({"user_id": "u9"})

    async def go():
        await tk.add_memory("user prefers bf16 precision for embeddings", "semantic", 0.8)
        await tk.store_skill(
            "search-then-rerank", "For precise retrieval tasks", ["kb_embedding_search", "kb_rerank"]
        )
        await tk.store_conversation("what precision?", "bf16 as you prefer")
        ctx = await tk.retrieve_all_context("which precision should embeddings use?")
        stats = await tk.memory_stats()
        return ctx, stats

    ctx, stats = asyncio.run(go())
    assert "bf16" in ctx
    assert "Recent context" in ctx
    import json

    st = json.loads(stats)
    assert st["semantic"] == 1 and st["working"] == 1 and st["episodic"] == 1


def test_skill_extraction_heuristic():
    tk = VectorMemoryToolkit({"user_id": "u"})

    async def go():
        record = {
            "input": "find the latest sales report",
            "tool_calls": [
                {"name": "kb_file_search", "arguments": "{}"},
                {"name": "kb_embedding_search", "arguments": "{}"},
            ],
        }
        out = await tk.extract_skill_from_trajectory(record)
        skills = await tk.search_skills("find a report")
        return out, skills

    out, skills = asyncio.run(go())
    assert out is not None
    assert "kb_file_search" in skills
