from .inference import init_detector, inference_detector
from .test import run_inference, evaluate_results
from .train import train_detector

__all__ = [
    "init_detector",
    "inference_detector",
    "run_inference",
    "evaluate_results",
    "train_detector",
]
