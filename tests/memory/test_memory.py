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


def test_update_memory_reembeds():
    tk = VectorMemoryToolkit({"user_id": "u-upd"})

    async def go():
        msg = await tk.add_memory("the capital of France is Paris", "semantic", 0.5)
        mid = msg.split()[-1]
        before = await tk.search_memory("volcano eruptions in Iceland", ["semantic"])
        await tk.update_memory(mid, content="Iceland volcano eruptions happen near Grindavik")
        after = await tk.search_memory("volcano eruptions in Iceland", ["semantic"])
        node = tk.store.get(mid)
        return before, after, node

    before, after, node = asyncio.run(go())
    assert "Grindavik" in after and "Grindavik" in node.content
    # only one live memory (same id reinserted, old row tombstoned)
    assert tk.store.stats("u-upd")["semantic"] == 1


def test_skill_outcome_loop_gates_failing_skills():
    """Weak #6 (r1): skills surfaced into context get outcome updates, and
    repeated failures push them under the min_success_rate gate."""
    tk = VectorMemoryToolkit({"user_id": "u-skill"})

    async def go():
        await tk.store_skill("bad-idea", "For any retrieval task", ["wrong_tool"])
        # surfaced in context → pending; report 4 failed runs
        for _ in range(4):
            ctx = await tk.retrieve_all_context("a retrieval task")
            assert "bad-idea" in ctx or not tk._pending_skill_ids  # surfaced at least once
            n = await tk.record_skill_outcomes(success=False)
        node = next(m for m in tk.store._nodes.values() if m.memory_type == "procedural")
        ctx_after = await tk.retrieve_all_context("a retrieval task")
        return node, ctx_after

    node, ctx_after = asyncio.run(go())
    assert node.use_count >= 3 and node.success_count == 0
    # success_rate 0 < 0.3 → the gate drops it from context
    assert "Applicable skills" not in ctx_after


def test_memory_persistence_roundtrip(tmp_path):
    path = str(tmp_path / "mem.json")
    tk = VectorMemoryToolkit({"user_id": "u-p", "persist_path": path})

    async def fill():
        await tk.store_skill("roundtrip", "testing persistence", ["step1"])
        ctx = await tk.retrieve_all_context("testing persistence task")
        await tk.record_skill_outcomes(success=True)

    asyncio.run(fill())

    tk2 = VectorMemoryToolkit({"user_id": "u-p"})

    async def reload():
        n = await tk2.store.load(path)
        hits = await tk2.search_skills("persistence")
        return n, hits

    n, hits = asyncio.run(reload())
    assert n >= 1
    assert "roundtrip" in hits and "100%" in hits  # usage stats survived


def test_schema_and_sql_pattern_memories():
    tk = VectorMemoryToolkit({"user_id": "u-sql"})

    async def go():
        await tk.store_schema_knowledge(
            "orders",
            ["id: INTEGER", "user_id: INTEGER (FK users.id)", "total: REAL"],
            description="customer orders",
            relationships=["orders.user_id -> users.id"],
        )
        await tk.store_sql_pattern(
            "monthly-rollup",
            "SELECT strftime('%Y-%m', date) m, SUM(total) FROM orders GROUP BY m",
            "Aggregate order totals by month",
            examples=["monthly revenue"],
        )
        schema = await tk.search_schema_knowledge("how do orders join users?")
        patterns = await tk.search_sql_patterns("revenue by month")
        # category partitions don't leak into each other
        only_schema = await tk.search_sql_patterns("orders join users table schema")
        return schema, patterns, only_schema

    schema, patterns, only_schema = asyncio.run(go())
    assert "orders.user_id -> users.id" in schema
    assert "monthly-rollup" in patterns
    assert "Relationships" not in only_schema
