import asyncio
import json

import pandas as pd
import pytest

from youtu_rag_tpu.agents.llm import FakeChatClient
from youtu_rag_tpu.agents.llm_agent import LLMAgent
from youtu_rag_tpu.core.config import IndexConfig, RAGConfig, VectorStoreConfig
from youtu_rag_tpu.ingest.agent import BuildRequest, KnowledgeBuilderAgent
from youtu_rag_tpu.ingest.processors import SourceTask
from youtu_rag_tpu.retrieval.kb import KnowledgeBase
from youtu_rag_tpu.tools.base import ToolkitConfig
from youtu_rag_tpu.tools.text2sql import Text2SQLAgent, Text2SQLToolkit


@pytest.fixture(scope="module")
def built_kb(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("t2s")
    df = pd.DataFrame(
        {
            "employee": ["alice", "bob", "carol", "dave", "erin", "frank"],
            "department": ["eng", "eng", "sales", "sales", "hr", "eng"],
            "salary": [120, 110, 90, 95, 80, 130],
        }
    )
    path = tmp / "staff.csv"
    df.to_csv(path, index=False)

    cfg = RAGConfig(vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=256, block_rows=128)))
    kb = KnowledgeBase("t2s", cfg)
    agent = KnowledgeBuilderAgent("t2s", kb.store, kb.embedder)
    report = asyncio.run(
        agent.build(BuildRequest(kb_name="t2s", tasks=[SourceTask("staff.csv", "table", path=str(path))]))
    )
    assert report.tables
    toolkit = Text2SQLToolkit(ToolkitConfig(config={"kb": kb, "tables": agent.tables}))
    return kb, agent, toolkit, report.tables[0]


def test_schema_link_finds_table(built_kb):
    _, _, toolkit, table = built_kb
    out = asyncio.run(toolkit.schema_link("which employee has the highest salary in a department?"))
    assert table in out
    assert "CREATE TABLE" in out
    assert "alice" in out or "employee" in out


def test_execute_sql_and_safety(built_kb):
    _, _, toolkit, table = built_kb
    res = json.loads(asyncio.run(toolkit.execute_sql(f'SELECT employee FROM "{table}" WHERE salary > 115')))
    assert sorted(r[0] for r in res["rows"]) == ["alice", "frank"]
    res = json.loads(asyncio.run(toolkit.execute_sql(f'DELETE FROM "{table}"')))
    assert "error" in res
    res = json.loads(asyncio.run(toolkit.execute_sql("SELECT * FROM nonexistent")))
    assert "error" in res


def test_list_tables(built_kb):
    _, _, toolkit, table = built_kb
    out = asyncio.run(toolkit.list_tables())
    assert table in out and "6 rows" in out


def test_text2sql_agent_with_retry(built_kb):
    _, _, toolkit, table = built_kb
    attempts = {"n": 0}

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You translate questions"):
            attempts["n"] += 1
            if attempts["n"] == 1:
                return FakeChatClient.text_response("SELECT nope FROM missing;")  # bad SQL
            return FakeChatClient.text_response(
                f'```sql\nSELECT employee, salary FROM "{table}" ORDER BY salary DESC LIMIT 1\n```'
            )
        if content.startswith("Answer the question"):
            return FakeChatClient.text_response("frank earns the most (130).")
        return FakeChatClient.text_response("?")

    llm = LLMAgent(client=FakeChatClient(rule_fn=rule))
    agent = Text2SQLAgent(toolkit, llm)
    out = asyncio.run(agent.text2sql("who earns the most?"))
    assert attempts["n"] == 2  # retried after the error
    assert out["result"]["rows"][0][0] == "frank"
    assert "frank" in out["answer"]


def test_remembered_sql_pattern_changes_generated_query(built_kb):
    """VERDICT r1 #5: a remembered SQL pattern must reach the generation
    prompt and change the produced query."""
    from youtu_rag_tpu.memory.toolkit import VectorMemoryToolkit

    _, agent_b, _, table = built_kb
    kb = built_kb[0]

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You translate questions"):
            if "Remembered SQL patterns" in content and "AVG(salary)" in content:
                return FakeChatClient.text_response(
                    f'SELECT department, AVG(salary) FROM "{table}" GROUP BY department;'
                )
            return FakeChatClient.text_response(f'SELECT salary FROM "{table}";')
        return FakeChatClient.text_response("ok")

    llm = LLMAgent(client=FakeChatClient(rule_fn=rule))

    # without memory: the naive query
    tk_plain = Text2SQLToolkit(ToolkitConfig(config={"kb": kb, "tables": agent_b.tables}))
    out_plain = asyncio.run(Text2SQLAgent(tk_plain, llm).text2sql("average salary per department?"))
    assert "AVG" not in out_plain["sql"]

    # with a remembered pattern: generation follows it
    mem = VectorMemoryToolkit({"user_id": "sqlmem"})
    asyncio.run(
        mem.store_sql_pattern(
            "avg-by-group",
            f'SELECT department, AVG(salary) FROM "{table}" GROUP BY department',
            "Average a numeric column per group",
            examples=["average salary per department"],
        )
    )
    tk_mem = Text2SQLToolkit(
        ToolkitConfig(config={"kb": kb, "tables": agent_b.tables, "memory": mem})
    )
    out_mem = asyncio.run(Text2SQLAgent(tk_mem, llm).text2sql("average salary per department?"))
    assert "AVG" in out_mem["sql"] and "GROUP BY" in out_mem["sql"]
    assert out_mem["result"]["rows"]


def test_successful_retry_learns_pattern(built_kb):
    """A query that failed then succeeded is stored as a sql_pattern."""
    from youtu_rag_tpu.memory.toolkit import VectorMemoryToolkit

    kb, agent_b, _, table = built_kb
    attempts = {"n": 0}

    def rule(messages, tools):
        content = messages[-1].content or ""
        if content.startswith("You translate questions"):
            attempts["n"] += 1
            if attempts["n"] == 1:
                return FakeChatClient.text_response("SELECT bogus FROM nowhere;")
            return FakeChatClient.text_response(f'SELECT COUNT(*) FROM "{table}";')
        return FakeChatClient.text_response("6 employees")

    mem = VectorMemoryToolkit({"user_id": "learner"})
    tk = Text2SQLToolkit(ToolkitConfig(config={"kb": kb, "tables": agent_b.tables, "memory": mem}))
    llm = LLMAgent(client=FakeChatClient(rule_fn=rule))
    out = asyncio.run(Text2SQLAgent(tk, llm).text2sql("how many employees are there?"))
    assert out["result"]["rows"] == [[6]]
    learned = asyncio.run(mem.search_sql_patterns("how many employees"))
    assert "COUNT(*)" in learned
