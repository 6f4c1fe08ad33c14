from .bop import BOPDataset
from .coco_io import CocoIndex
from .loader import DataLoader, collate
from .pipeline import Compose, build_pipeline

__all__ = ["BOPDataset", "CocoIndex", "DataLoader", "collate", "Compose", "build_pipeline"]
