"""EMD saliency metric: native C++ emd_hat with a pure-numpy fallback.

Equivalent of the reference's EMD.m + FastEMD mex chain
(/root/reference/code_for_Metrics/EMD.m:28-70 and FastEMD X7/X8 in
SURVEY.md §2.5): maps downsized 1/32, sum-normalized, full Euclidean
ground-distance matrix, emd_hat with extra_mass_penalty=0.

The native solver lives in vinet_tpu/native/emd/ (successive-shortest-path
min-cost flow, C ABI via ctypes; built on first use with `make`). The
fallback is scipy's linear_sum_assignment-free transportation solve via the
same SSP algorithm in python — slow but exact, used when no compiler exists.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "emd")


@functools.lru_cache(maxsize=1)
def _load_native():
    so = os.path.join(_NATIVE_DIR, "libemd.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.emd_hat_compute.restype = ctypes.c_double
    lib.emd_hat_compute.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ]
    return lib


def emd_hat(P, Q, D, *, extra_mass_penalty: float = 0.0, threshold: float = 0.0,
            return_flow: bool = False, force_fallback: bool = False):
    """emd_hat(P, Q, D): min-cost transport of min(|P|,|Q|) mass plus
    extra_mass_penalty * ||P|-|Q|| (penalty -1 => max(D))."""
    P = np.ascontiguousarray(P, np.float64).ravel()
    Q = np.ascontiguousarray(Q, np.float64).ravel()
    n = P.size
    D = np.ascontiguousarray(D, np.float64).reshape(n, n)

    lib = None if force_fallback else _load_native()
    if lib is not None:
        flow = np.zeros((n, n), np.float64) if return_flow else None
        cp = ctypes.POINTER(ctypes.c_double)
        val = lib.emd_hat_compute(
            P.ctypes.data_as(cp), Q.ctypes.data_as(cp), D.ctypes.data_as(cp),
            n, extra_mass_penalty, threshold,
            flow.ctypes.data_as(cp) if flow is not None else None,
        )
        return (val, flow) if return_flow else val
    return _emd_hat_py(P, Q, D, extra_mass_penalty, threshold, return_flow)


def _emd_hat_py(P, Q, D, extra_mass_penalty, threshold, return_flow):
    """Exact fallback via scipy HiGHS: the transportation LP
    min <C, F> s.t. F>=0, row sums <= p, col sums <= q, total = min(|p|,|q|),
    after the same zero-cost diagonal pre-flow as the native solver."""
    from scipy.optimize import linprog
    from scipy.sparse import lil_matrix

    if threshold > 0:
        D = np.minimum(D, threshold)
    if extra_mass_penalty < 0:
        extra_mass_penalty = float(D.max())
    p, q = P.copy(), Q.copy()
    n = p.size
    flow = np.zeros((n, n)) if return_flow else None
    diag = np.arange(n)
    m = np.where(D[diag, diag] == 0, np.minimum(p, q), 0.0)
    p -= m
    q -= m
    if flow is not None:
        flow[diag, diag] += m
    penalty = abs(P.sum() - Q.sum()) * extra_mass_penalty

    srcs = np.where(p > 1e-15)[0]
    dsts = np.where(q > 1e-15)[0]
    to_ship = min(p[srcs].sum() if srcs.size else 0.0, q[dsts].sum() if dsts.size else 0.0)
    if to_ship <= 1e-15:
        return (penalty, flow) if return_flow else penalty

    ns, nd = len(srcs), len(dsts)
    C = D[np.ix_(srcs, dsts)].ravel()
    a_ub = lil_matrix((ns + nd, ns * nd))
    for i in range(ns):
        a_ub[i, i * nd : (i + 1) * nd] = 1.0
    for j in range(nd):
        a_ub[ns + j, j::nd] = 1.0
    b_ub = np.concatenate([p[srcs], q[dsts]])
    a_eq = np.ones((1, ns * nd))
    res = linprog(C, A_ub=a_ub.tocsr(), b_ub=b_ub, A_eq=a_eq, b_eq=[to_ship],
                  method="highs")
    if not res.success:
        raise RuntimeError(f"EMD fallback LP failed: {res.message}")
    if flow is not None:
        flow[np.ix_(srcs, dsts)] += res.x.reshape(ns, nd)
    total = float(res.fun) + penalty
    return (total, flow) if return_flow else total


def emd_score(saliency_map, fixation_map, *, downsize: int = 32) -> float:
    """EMD.m equivalent: downsize both maps (imresize scale-factor form:
    output size = ceil(size/downsize), antialiased bicubic — EMD.m:33-34),
    sum-normalize, Euclidean ground distance over the grid, emd_hat with zero
    extra-mass penalty."""
    from vinet_tpu.metrics.imresize import imresize

    fm = np.asarray(fixation_map, np.float64)
    im1 = imresize(fm, scale=1.0 / downsize)
    h, w = im1.shape
    sm = np.asarray(saliency_map, np.float64)
    im2 = imresize(sm, (h, w))
    # Bicubic ringing can produce small negative masses; EMD.m passes them
    # into FastEMD unguarded (undefined for negative supply). We clamp to 0
    # before normalizing — documented deviation, keeps the LP well-posed.
    im1 = np.maximum(im1, 0.0)
    im2 = np.maximum(im2, 0.0)
    im1 = im1 / im1.sum()
    im2 = im2 / im2.sum()

    # column-major flattening like the MATLAB loop (EMD.m:47-59); D is
    # symmetric in grid distance so the order only needs to be consistent
    r, c = np.meshgrid(np.arange(h), np.arange(w), indexing="xy")
    rr = r.ravel()
    cc = c.ravel()
    D = np.sqrt((rr[:, None] - rr[None, :]) ** 2 + (cc[:, None] - cc[None, :]) ** 2)
    return float(emd_hat(im1.T.ravel(), im2.T.ravel(), D, extra_mass_penalty=0.0))
