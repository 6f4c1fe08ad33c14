from .coco_eval import COCOEvaluator
from .lvis_eval import LVISEvaluator
from .voc_eval import average_precision, eval_map, eval_recalls

__all__ = [
    "COCOEvaluator",
    "LVISEvaluator",
    "average_precision",
    "eval_map",
    "eval_recalls",
]
