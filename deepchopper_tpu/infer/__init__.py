"""Inference engine (predict loop, fused predict+chop)."""

from .engine import PredictEngine, PredictStats

__all__ = ["PredictEngine", "PredictStats"]
