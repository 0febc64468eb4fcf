from vinet_tpu.training.losses import (
    kldiv,
    cc,
    similarity,
    nss,
    LossConfig,
    loss_func,
)

__all__ = ["kldiv", "cc", "similarity", "nss", "LossConfig", "loss_func"]

# streaming-consistent fine-tuning (training/streaming_ft.py) is imported
# lazily by its users — importing it here would pull jax graph code into
# every `vinet_tpu.training` import.
