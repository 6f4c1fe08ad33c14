from .inference import (
    async_inference_detector,
    inference_detector,
    init_detector,
    show_result,
    show_result_pyplot,
)
from .serving import BatchingDetector
from .test import run_inference, evaluate_results
from .train import train_detector

__all__ = [
    "init_detector",
    "inference_detector",
    "async_inference_detector",
    "BatchingDetector",
    "show_result",
    "show_result_pyplot",
    "run_inference",
    "evaluate_results",
    "train_detector",
]
