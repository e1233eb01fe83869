from .service import DBService
from .models import TrajectoryRecord, EvaluationSample, ToolTraceRecord, GenerationTraceRecord

__all__ = [
    "DBService",
    "EvaluationSample",
    "GenerationTraceRecord",
    "ToolTraceRecord",
    "TrajectoryRecord",
]
