"""Inference pipelines: mesh → per-vertex FDI labels → challenge JSON.

Replaces the reference's inference_pipelines/ package (sem / tgn / tsegnet variants,
the factory, and the grand-challenge adapter)."""

from .maker import make_inference_pipeline
from .predict import ScanSegmentation
from .sem import SemInferencePipeline

__all__ = ["make_inference_pipeline", "ScanSegmentation", "SemInferencePipeline"]
