from .coco_eval import COCOEvaluator
from .voc_eval import average_precision, eval_map, eval_recalls

__all__ = ["COCOEvaluator", "average_precision", "eval_map", "eval_recalls"]
