from .rd_eval import FrameMetrics, GOPEvaluator, aggregate, write_results
from .registry import TEST_DATA, EvalDataset

__all__ = [
    "FrameMetrics",
    "GOPEvaluator",
    "aggregate",
    "write_results",
    "TEST_DATA",
    "EvalDataset",
]
