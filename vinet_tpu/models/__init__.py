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
from vinet_tpu.models.soundnet import SoundNet
from vinet_tpu.models.avinet import AViNet, AViNetFusion, Bilinear
from vinet_tpu.models.transformer import TransformerEncoder

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
    "SoundNet",
    "AViNet",
    "AViNetFusion",
    "Bilinear",
    "TransformerEncoder",
]
