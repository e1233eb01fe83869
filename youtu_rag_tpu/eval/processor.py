"""Benchmark processors: preprocess questions, judge answers.

Parity with ``utu/eval/processer/`` (GAIA/WebWalkerQA/XBench/BrowseComp
share a base LLM-judge processor): each processor augments the raw
question and judges a response into (reward, correct). ``exact_match`` is
the hermetic default; ``llm_judge`` uses an LLMAgent with the standard
judge template (ref prompts: utu/prompts/eval/judge_templates.yaml)."""

from __future__ import annotations

import json
import re
import string
from typing import Any

from ..db.models import EvaluationSample
from ..utils.log import get_logger

logger = get_logger("eval.processor")


class BaseProcessor:
    name = "base"

    def preprocess(self, sample: EvaluationSample) -> EvaluationSample:
        sample.augmented_question = sample.augmented_question or sample.raw_question
        return sample

    async def judge(self, sample: EvaluationSample) -> EvaluationSample:
        raise NotImplementedError

    def stat(self, samples: list[EvaluationSample]) -> dict[str, Any]:
        judged = [s for s in samples if s.correct is not None]
        correct = sum(1 for s in judged if s.correct)
        return {
            "total": len(samples),
            "judged": len(judged),
            "correct": correct,
            "accuracy": correct / len(judged) if judged else 0.0,
            "avg_time_cost": (
                sum(s.time_cost for s in judged) / len(judged) if judged else 0.0
            ),
        }


def _normalize(text: str) -> str:
    text = text.lower().strip()
    text = text.translate(str.maketrans("", "", string.punctuation))
    return re.sub(r"\s+", " ", text)


class ExactMatchProcessor(BaseProcessor):
    """Normalized exact/containment match — deterministic."""

    name = "exact_match"

    async def judge(self, sample: EvaluationSample) -> EvaluationSample:
        resp = _normalize(sample.response or "")
        gold = _normalize(sample.correct_answer)
        sample.correct = bool(gold) and (resp == gold or gold in resp)
        sample.reward = 1.0 if sample.correct else 0.0
        sample.stage = "judged"
        return sample


JUDGE_TEMPLATE = """Judge whether the model response answers the question \
correctly given the reference answer.

Question: {question}
Reference answer: {answer}
Model response: {response}

Reply with JSON only: {{"correct": true|false, "reasoning": "..."}}"""


class LLMJudgeProcessor(BaseProcessor):
    """LLM-as-judge (ref: base_llm_processor judge flow)."""

    name = "llm_judge"

    def __init__(self, judge_agent):
        self.judge_agent = judge_agent

    async def judge(self, sample: EvaluationSample) -> EvaluationSample:
        prompt = JUDGE_TEMPLATE.format(
            question=sample.augmented_question or sample.raw_question,
            answer=sample.correct_answer,
            response=sample.response or "",
        )
        raw = await self.judge_agent.run(prompt)
        sample.judged_response = raw
        try:
            data = json.loads(raw[raw.index("{") : raw.rindex("}") + 1])
            sample.correct = bool(data.get("correct"))
        except (ValueError, json.JSONDecodeError):
            logger.warning("unparseable judge output: %r", raw[:200])
            sample.correct = False
        sample.reward = 1.0 if sample.correct else 0.0
        sample.stage = "judged"
        return sample


class ProcessorFactory:
    @staticmethod
    def create(name: str, judge_agent=None) -> BaseProcessor:
        if name == "exact_match":
            return ExactMatchProcessor()
        if name == "llm_judge":
            assert judge_agent is not None, "llm_judge needs a judge agent"
            return LLMJudgeProcessor(judge_agent)
        raise ValueError(f"unknown processor {name!r}")
