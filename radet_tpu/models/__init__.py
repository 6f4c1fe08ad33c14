from .anchor_heads import AnchorHead, ATSSHead, flatten_anchor_outputs
from .anchor_loss import anchor_head_loss, atss_loss
from .builder import build_detector
from .detector import RADet, flatten_head_outputs, preprocess_images
from .fpn import FPN
from .radet_head import RADetHead
from .resnet import ResNet
from .transformer import (
    DETRTransformer,
    FFN,
    LearnedPositionalEncoding,
    MultiheadAttention,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
    sine_positional_encoding,
)

__all__ = [
    "AnchorHead",
    "ATSSHead",
    "flatten_anchor_outputs",
    "anchor_head_loss",
    "atss_loss",
    "build_detector",
    "RADet",
    "flatten_head_outputs",
    "preprocess_images",
    "FPN",
    "RADetHead",
    "ResNet",
    "DETRTransformer",
    "TransformerEncoderLayer",
    "TransformerDecoderLayer",
    "MultiheadAttention",
    "FFN",
    "LearnedPositionalEncoding",
    "sine_positional_encoding",
]
