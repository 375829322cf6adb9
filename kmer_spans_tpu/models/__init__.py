from .scoring import (
    Log2MedianScoring,
    RankScoring,
    ThresholdScoring,
    WeightScoring,
)

__all__ = [
    "RankScoring",
    "ThresholdScoring",
    "Log2MedianScoring",
    "WeightScoring",
]
