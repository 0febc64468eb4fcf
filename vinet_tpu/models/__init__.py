from vinet_tpu.models.layers import (
    Conv3d,
    Conv1d,
    BatchNorm,
    MaxPool3d,
    ReLU,
    Sequential,
    Sigmoid,
)
from vinet_tpu.models.s3d import S3DBackbone
from vinet_tpu.models.decoder import Decoder, decoder_plan
from vinet_tpu.models.vinet import ViNet

__all__ = [
    "Conv3d",
    "Conv1d",
    "BatchNorm",
    "MaxPool3d",
    "ReLU",
    "Sequential",
    "Sigmoid",
    "S3DBackbone",
    "Decoder",
    "decoder_plan",
    "ViNet",
]
