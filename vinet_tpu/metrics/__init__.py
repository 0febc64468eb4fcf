from vinet_tpu.metrics.saliency import (
    cc_score,
    similarity_score,
    nss_score,
    kldiv_score,
    auc_judd,
    auc_borji,
    auc_shuffled,
    info_gain,
    create_shuffle_map,
)

__all__ = [
    "cc_score",
    "similarity_score",
    "nss_score",
    "kldiv_score",
    "auc_judd",
    "auc_borji",
    "auc_shuffled",
    "info_gain",
    "create_shuffle_map",
]
