from .config import EvalConfig
from .benchmark import BaseBenchmark
from .processor import ProcessorFactory, BaseProcessor, ExactMatchProcessor, LLMJudgeProcessor

__all__ = [
    "BaseBenchmark",
    "BaseProcessor",
    "EvalConfig",
    "ExactMatchProcessor",
    "LLMJudgeProcessor",
    "ProcessorFactory",
]
