import asyncio

from youtu_rag_tpu.db.models import EvaluationSample, ToolTraceRecord, TrajectoryRecord
from youtu_rag_tpu.db.service import DBService


def test_noop_mode_is_safe():
    db = DBService(url=None)
    assert not db.available
    assert db.add(TrajectoryRecord("t1", "q")) is False
    assert db.select(TrajectoryRecord) == []
    assert db.count(TrajectoryRecord) == 0


def test_add_select_roundtrip(tmp_path):
    db = DBService(url=f"sqlite:///{tmp_path}/t.db")
    rec = TrajectoryRecord(
        trace_id="t1",
        input="what is 2+2",
        output="4",
        trajectory=[{"role": "user", "content": "what is 2+2"}],
        tool_calls=[{"name": "add", "arguments": "{}"}],
        usage_input_tokens=10,
    )
    assert db.add(rec)
    got = db.select(TrajectoryRecord, where={"trace_id": "t1"})
    assert len(got) == 1
    assert got[0].output == "4"
    assert got[0].trajectory[0]["role"] == "user"
    assert got[0].tool_calls[0]["name"] == "add"
    assert got[0].usage_input_tokens == 10


def test_update_and_count(tmp_path):
    db = DBService(url=f"sqlite:///{tmp_path}/t.db")
    for i in range(3):
        db.add(EvaluationSample(dataset="d", index=i, raw_question=f"q{i}", exp_id="e1"))
    assert db.count(EvaluationSample, {"exp_id": "e1"}) == 3
    n = db.update(EvaluationSample, {"index": 1}, {"response": "ans", "stage": "rollout"})
    assert n == 1
    got = db.select(EvaluationSample, where={"index": 1})
    assert got[0].response == "ans"


def test_agent_trajectory_to_db(tmp_path):
    """SimpleAgent trajectory sink → DBService row (the wiring the API uses)."""
    from youtu_rag_tpu.agents.config import AgentConfig
    from youtu_rag_tpu.agents.llm import FakeChatClient
    from youtu_rag_tpu.agents.simple_agent import SimpleAgent

    db = DBService(url=f"sqlite:///{tmp_path}/traj.db")

    async def sink(record):
        db.add(TrajectoryRecord.from_recorder_dict(record))

    agent = SimpleAgent(
        AgentConfig(),
        client=FakeChatClient(scripted=[FakeChatClient.text_response("done")]),
        trajectory_sink=sink,
    )
    asyncio.run(agent.run("task one"))
    rows = db.select(TrajectoryRecord)
    assert rows and rows[0].input == "task one" and rows[0].output == "done"


def test_tracing_db_sink(tmp_path):
    from youtu_rag_tpu.tracing.tracer import setup_tracing, get_tracer

    db = DBService(url=f"sqlite:///{tmp_path}/trace.db")
    setup_tracing(db_service=db)
    t = get_tracer()
    with t.trace("tr-fixed"):
        with t.span("tool", "kb_embedding_search", arguments='{"query": "x"}') as s:
            s.attributes["output"] = "result text"
        with t.span("generation", "agent", model="m1") as s:
            s.attributes["output"] = "hello"
            s.attributes["input_tokens"] = 5
    rows = db.select(ToolTraceRecord)
    assert rows and rows[0].name == "kb_embedding_search"
    assert rows[0].trace_id == "tr-fixed"
    from youtu_rag_tpu.db.models import GenerationTraceRecord

    gen = db.select(GenerationTraceRecord)
    assert gen and gen[0].trace_id == "tr-fixed" and gen[0].input_tokens == 5
    setup_tracing()  # detach


def test_span_error_capture():
    from youtu_rag_tpu.tracing.tracer import get_tracer

    t = get_tracer()
    try:
        with t.span("tool", "boom"):
            raise RuntimeError("x")
    except RuntimeError:
        pass
    assert t.spans[-1].error == "x"
    assert t.spans[-1].end_time is not None
