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


class GaiaProcessor(BaseProcessor):
    """GAIA-style: file-attachment question augmentation + the benchmark's
    answer normalization (numbers stripped of units/commas, lists compared
    element-wise) — the scoring rules of the reference's GAIA processer."""

    name = "gaia"

    def preprocess(self, sample: EvaluationSample) -> EvaluationSample:
        q = sample.raw_question
        file_path = None
        if sample.source and not sample.source.endswith((".jsonl", ".json")):
            file_path = sample.source
        try:
            meta = json.loads(sample.augmented_question) if sample.augmented_question else {}
            file_path = meta.get("file_name") or file_path
        except (json.JSONDecodeError, TypeError):
            pass
        if file_path:
            q = f"{q}\n\nAttached file: {file_path}"
        sample.augmented_question = (
            f"{q}\n\nReport your answer as a number or as few words as possible; "
            "do not use articles or abbreviations."
        )
        return sample

    @staticmethod
    def _norm_number(s: str) -> float | None:
        t = re.sub(r"[,$%\s]", "", s)
        try:
            return float(t)
        except ValueError:
            return None

    @classmethod
    def _norm(cls, s: str) -> str:
        return _normalize(s)

    async def judge(self, sample: EvaluationSample) -> EvaluationSample:
        resp = (sample.response or "").strip()
        gold = sample.correct_answer.strip()
        # list answers: element-wise comparison
        if "," in gold:
            golds = [g.strip() for g in gold.split(",")]
            resps = [r.strip() for r in resp.split(",")]
            ok = len(golds) == len(resps) and all(
                self._match_one(r, g) for r, g in zip(resps, golds)
            )
        else:
            ok = self._match_one(resp, gold)
        sample.correct = ok
        sample.reward = 1.0 if ok else 0.0
        sample.stage = "judged"
        return sample

    @classmethod
    def _match_one(cls, resp: str, gold: str) -> bool:
        gn = cls._norm_number(gold)
        if gn is not None:
            for tok in re.findall(r"[-+]?[\d.,]+", resp):
                rn = cls._norm_number(tok)
                if rn is not None and abs(rn - gn) < 1e-6:
                    return True
            return False
        return cls._norm(gold) != "" and cls._norm(gold) in cls._norm(resp)


class WebWalkerProcessor(LLMJudgeProcessor):
    """WebWalkerQA-style: browsing questions judged by an LLM with the
    reference-answer template (judge_templates.yaml pattern)."""

    name = "webwalker"

    def preprocess(self, sample: EvaluationSample) -> EvaluationSample:
        sample.augmented_question = (
            f"{sample.raw_question}\n\nUse web tools to browse for the answer "
            "and respond concisely."
        )
        return sample


class ProcessorFactory:
    """Ref: utu/eval/processer/__init__.py:4-10 (GAIA/WebWalkerQA/XBench/
    BrowseComp); xbench/browsecomp share the llm_judge flow here."""

    @staticmethod
    def create(name: str, judge_agent=None) -> BaseProcessor:
        if name == "exact_match":
            return ExactMatchProcessor()
        if name == "gaia":
            return GaiaProcessor()
        if name in ("llm_judge", "xbench", "browsecomp"):
            assert judge_agent is not None, f"{name} needs a judge agent"
            return LLMJudgeProcessor(judge_agent)
        if name == "webwalker":
            assert judge_agent is not None, "webwalker needs a judge agent"
            return WebWalkerProcessor(judge_agent)
        raise ValueError(f"unknown processor {name!r}")
