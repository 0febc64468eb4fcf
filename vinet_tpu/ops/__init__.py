from vinet_tpu.ops.conv import conv3d, conv1d, maxpool3d, maxpool1d
from vinet_tpu.ops.norm import batchnorm_apply, batchnorm_train, fold_bn_into_conv
from vinet_tpu.ops.upsample import upsample2x_hw
from vinet_tpu.ops.image import (
    resize_bilinear,
    gaussian_blur,
    normalize_imagenet,
    minmax_normalize,
)

__all__ = [
    "conv3d",
    "conv1d",
    "maxpool3d",
    "maxpool1d",
    "batchnorm_apply",
    "batchnorm_train",
    "fold_bn_into_conv",
    "upsample2x_hw",
    "resize_bilinear",
    "gaussian_blur",
    "normalize_imagenet",
    "minmax_normalize",
]
