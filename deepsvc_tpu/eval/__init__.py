from .bdrate import bd_quality, bd_rate
from .rd_eval import FrameMetrics, GOPEvaluator, aggregate, write_aggregate, write_results
from .registry import TEST_DATA, EvalDataset

__all__ = [
    "bd_quality",
    "bd_rate",
    "FrameMetrics",
    "GOPEvaluator",
    "aggregate",
    "write_aggregate",
    "write_results",
    "TEST_DATA",
    "EvalDataset",
]
