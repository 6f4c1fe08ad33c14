from .bop import BOPDataset
from .coco_io import CocoIndex
from .datasets_extra import (
    DATASET_TYPES,
    CityscapesDataset,
    CocoDataset,
    DeepFashionDataset,
    KittiDataset,
    LVISV1Dataset,
    VOCDataset,
    WIDERFaceDataset,
    XMLDataset,
    YcbvDataset,
)
from .loader import DataLoader, collate
from .pipeline import Compose, build_pipeline

__all__ = [
    "BOPDataset",
    "CocoIndex",
    "DataLoader",
    "collate",
    "Compose",
    "build_pipeline",
    "DATASET_TYPES",
    "CocoDataset",
    "YcbvDataset",
    "KittiDataset",
    "DeepFashionDataset",
    "CityscapesDataset",
    "LVISV1Dataset",
    "XMLDataset",
    "VOCDataset",
    "WIDERFaceDataset",
]
