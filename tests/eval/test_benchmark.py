import asyncio
import json

from youtu_rag_tpu.agents.config import AgentConfig
from youtu_rag_tpu.agents.llm import FakeChatClient
from youtu_rag_tpu.agents.llm_agent import LLMAgent
from youtu_rag_tpu.agents.simple_agent import SimpleAgent
from youtu_rag_tpu.db.models import EvaluationSample
from youtu_rag_tpu.eval.benchmark import BaseBenchmark
from youtu_rag_tpu.eval.config import EvalConfig, EvalDataConfig
from youtu_rag_tpu.eval.processor import ExactMatchProcessor


def _samples():
    return [
        EvaluationSample(dataset="d", index=0, raw_question="capital of france?", correct_answer="Paris"),
        EvaluationSample(dataset="d", index=1, raw_question="2+2?", correct_answer="4"),
    ]


def test_exact_match_processor():
    p = ExactMatchProcessor()
    s = EvaluationSample(dataset="d", index=0, raw_question="q", correct_answer="Paris", response="It is Paris.")
    s = asyncio.run(p.judge(s))
    assert s.correct and s.reward == 1.0
    s2 = EvaluationSample(dataset="d", index=1, raw_question="q", correct_answer="Paris", response="London")
    assert not asyncio.run(p.judge(s2)).correct


def test_benchmark_full_pipeline(tmp_path):
    answers = {"capital of france?": "The capital is Paris", "2+2?": "the answer is 4"}
    client = FakeChatClient(
        rule_fn=lambda msgs, tools: FakeChatClient.text_response(
            answers.get(next(m.content for m in reversed(msgs) if m.role == "user"), "?")
        )
    )
    agent = SimpleAgent(AgentConfig(), client=client)
    cfg = EvalConfig(exp_id="t1", db_url=f"sqlite:///{tmp_path}/eval.db")
    bench = BaseBenchmark(cfg, agent=agent)
    stats = asyncio.run(bench.main(_samples()))
    assert stats["accuracy"] == 1.0
    assert stats["judged"] == 2
    assert bench.db.count(EvaluationSample) == 4  # rollout + judged rows


def test_benchmark_rollout_error_isolation():
    class Boom(FakeChatClient):
        async def chat(self, messages, tools=None, **kw):
            raise RuntimeError("down")

    agent = SimpleAgent(AgentConfig(), client=Boom())
    bench = BaseBenchmark(EvalConfig(exp_id="t2"), agent=agent)
    stats = asyncio.run(bench.main(_samples()))
    assert stats["judged"] == 2
    assert stats["accuracy"] == 0.0


def test_llm_judge_processor():
    judge_client = FakeChatClient(
        rule_fn=lambda msgs, tools: FakeChatClient.text_response(
            json.dumps({"correct": "paris" in msgs[-1].content.lower(), "reasoning": "ok"})
        )
    )
    judge = LLMAgent(client=judge_client)
    cfg = EvalConfig(exp_id="t3", processor="llm_judge")
    agent = SimpleAgent(
        AgentConfig(), client=FakeChatClient(rule_fn=lambda m, t: FakeChatClient.text_response("Paris"))
    )
    bench = BaseBenchmark(cfg, agent=agent, judge_agent=judge)
    stats = asyncio.run(bench.main([_samples()[0]]))
    assert stats["accuracy"] == 1.0


def test_load_samples_jsonl(tmp_path):
    src = tmp_path / "data.jsonl"
    src.write_text('{"question": "q1", "answer": "a1"}\n{"question": "q2", "answer": "a2"}\n')
    cfg = EvalConfig(data=EvalDataConfig(dataset="file", source=str(src)))
    bench = BaseBenchmark(cfg, agent=SimpleAgent(AgentConfig(), client=FakeChatClient()))
    samples = bench.load_samples()
    assert len(samples) == 2
    assert samples[1].correct_answer == "a2"
