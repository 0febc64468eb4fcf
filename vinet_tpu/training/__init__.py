from vinet_tpu.training.losses import (
    kldiv,
    cc,
    similarity,
    nss,
    LossConfig,
    loss_func,
)

__all__ = ["kldiv", "cc", "similarity", "nss", "LossConfig", "loss_func"]
