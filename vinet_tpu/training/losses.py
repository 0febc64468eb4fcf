"""Training losses / online metrics in pure JAX.

Semantics follow the reference's loss.py (kldiv /root/reference/loss.py:13-38,
cc :80-99, similarity :53-78, nss :101-120, normalize_map :41-51) including the
MIT eps = 2.2204e-16 and torch's unbiased std. Everything is batched (B, H, W)
and jit/grad-safe — no host round trips (the reference resizes pred maps via
cv2 inside nss, loss.py:102-106; here resizing is the caller's concern).

The multi-frame path of the reference's loss_func loops Python-side per frame
and its `--l1` branch hits a NameError (`criterion` undefined in get_loss,
/root/reference/utils.py:16) — here multi-frame folds into the batch axis and
l1 works.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

EPS = 2.2204e-16  # MATLAB eps, used by the MIT benchmark & the reference


def _flat(x):
    return x.reshape(x.shape[0], -1)


def _sum_normalize(x):
    s = jnp.sum(_flat(x), axis=1).reshape(-1, 1, 1)
    return x / s


def normalize_map(s_map):
    """Per-sample min-max normalization (reference normalize_map)."""
    mn = jnp.min(_flat(s_map), axis=1).reshape(-1, 1, 1)
    mx = jnp.max(_flat(s_map), axis=1).reshape(-1, 1, 1)
    return (s_map - mn) / (mx - mn)


def kldiv(s_map, gt):
    """KL divergence between sum-normalized maps; mean over batch."""
    s_map = _sum_normalize(s_map)
    gt = _sum_normalize(gt)
    r = _flat(gt) * jnp.log(EPS + _flat(gt) / (_flat(s_map) + EPS))
    return jnp.mean(jnp.sum(r, axis=1))


def cc(s_map, gt):
    """Pearson correlation after per-sample standardization (unbiased std,
    matching torch.std)."""

    def std(x):
        n = x.shape[1]
        mu = jnp.mean(x, axis=1, keepdims=True)
        return jnp.sqrt(jnp.sum(jnp.square(x - mu), axis=1, keepdims=True) / (n - 1))

    s = _flat(s_map)
    g = _flat(gt)
    s = (s - jnp.mean(s, axis=1, keepdims=True)) / std(s)
    g = (g - jnp.mean(g, axis=1, keepdims=True)) / std(g)
    ab = jnp.sum(s * g, axis=1)
    aa = jnp.sum(s * s, axis=1)
    bb = jnp.sum(g * g, axis=1)
    return jnp.mean(ab / jnp.sqrt(aa * bb))


def similarity(s_map, gt):
    """Histogram intersection of min-max- then sum-normalized maps."""
    s_map = _sum_normalize(normalize_map(s_map))
    gt = _sum_normalize(normalize_map(gt))
    return jnp.mean(jnp.sum(jnp.minimum(_flat(s_map), _flat(gt)), axis=1))


def nss(s_map, gt):
    """Normalized scanpath saliency: mean standardized saliency at fixations.
    gt is a binary fixation map of the same shape."""

    def std(x):
        n = x.shape[1]
        mu = jnp.mean(x, axis=1, keepdims=True)
        return jnp.sqrt(jnp.sum(jnp.square(x - mu), axis=1, keepdims=True) / (n - 1))

    s = _flat(s_map)
    s = (s - jnp.mean(s, axis=1, keepdims=True)) / (std(s) + EPS)
    num = jnp.sum(s * _flat(gt), axis=1)
    cnt = jnp.sum(_flat(gt), axis=1)
    return jnp.mean(num / cnt)


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Coefficient plumbing matching train.py's flags
    (/root/reference/train.py:24-41); negative coefficients on
    higher-is-better metrics because the total is minimized."""

    kldiv: bool = True
    cc: bool = False
    sim: bool = False
    nss: bool = False
    l1: bool = False
    kldiv_coeff: float = 1.0
    cc_coeff: float = -1.0
    sim_coeff: float = -1.0
    nss_coeff: float = 1.0
    l1_coeff: float = 1.0


def loss_func(pred_map, gt, cfg: LossConfig):
    """Weighted loss. pred_map/gt: (B, H, W) or (B, Cl, H, W) multi-frame,
    which is folded into the batch axis (mathematically identical to the
    reference's per-frame Python loop + mean, but one fused kernel)."""
    if pred_map.ndim == 4:
        pred_map = pred_map.reshape(-1, *pred_map.shape[2:])
        gt = gt.reshape(-1, *gt.shape[2:])
    loss = jnp.float32(0.0)
    if cfg.kldiv:
        loss += cfg.kldiv_coeff * kldiv(pred_map, gt)
    if cfg.cc:
        loss += cfg.cc_coeff * cc(pred_map, gt)
    if cfg.l1:
        loss += cfg.l1_coeff * jnp.mean(jnp.abs(pred_map - gt))
    if cfg.sim:
        loss += cfg.sim_coeff * similarity(pred_map, gt)
    if cfg.nss:
        loss += cfg.nss_coeff * nss(pred_map, gt)
    return loss
