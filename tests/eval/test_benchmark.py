import asyncio
import json

import pytest

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


def test_gaia_processor_scoring():
    from youtu_rag_tpu.eval.processor import GaiaProcessor

    p = GaiaProcessor()

    def judge(resp, gold):
        s = EvaluationSample(dataset="g", index=0, raw_question="q", correct_answer=gold, response=resp)
        return asyncio.run(p.judge(s)).correct

    assert judge("The answer is 1,234", "1234")
    assert judge("$42.50", "42.5")
    assert not judge("43", "42")
    assert judge("Paris", "paris")
    assert judge("apple, banana, cherry", "apple,banana,cherry")
    assert not judge("apple, banana", "apple,banana,cherry")

    s = EvaluationSample(dataset="g", index=0, raw_question="how many?", correct_answer="3")
    s = p.preprocess(s)
    assert "as few words as possible" in s.augmented_question


def test_processor_factory_names():
    from youtu_rag_tpu.eval.processor import GaiaProcessor, ProcessorFactory, WebWalkerProcessor

    judge = LLMAgent(client=FakeChatClient())
    assert isinstance(ProcessorFactory.create("gaia"), GaiaProcessor)
    assert isinstance(ProcessorFactory.create("webwalker", judge), WebWalkerProcessor)
    assert ProcessorFactory.create("xbench", judge) is not None
    with pytest.raises(ValueError):
        ProcessorFactory.create("nope")
