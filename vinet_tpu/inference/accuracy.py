"""Parity-vs-streaming accuracy evaluation on the synthetic blob fixture.

One implementation behind three consumers — scripts/exp_streaming_ft.py's
full study, bench.py's BENCH_MODE=streamft record, and
tests/test_streaming_ft_artifact.py's regression assertions — so the
numbers they report are the same function of the same fixture
(vinet_tpu/data/synthetic.py). Reference semantics being compared: the
exact sliding window of /root/reference/generate_result.py:58-73 (parity)
vs this framework's --streaming chunked encoder
(vinet_tpu/inference/streaming.py), scored against the fixture's ground
truth and against each other.
"""

from __future__ import annotations

import numpy as np


def evaluate_modes(model, params, state, *, n_frames=96, seeds=(100, 101),
                   dtype=None, parity_stride=1, batch=16, chunk=128):
    """Score parity and streaming inference against the fixture GT.

    parity_stride > 1 scores the (expensive: one full-window forward per
    map) parity mode on every stride-th frame only — the streaming mode and
    the agreement stats still cover those same frames, so the deltas stay
    like-for-like. Returns a dict of means over all scored frames of all
    seeds: parity_cc, streaming_cc, cc_delta (streaming - parity),
    agreement_cc, plus per-seed rows.
    """
    import jax.numpy as jnp

    from vinet_tpu.data.synthetic import make_eval_video
    from vinet_tpu.inference import SlidingWindowPredictor
    from vinet_tpu.inference.streaming import StreamingPredictor
    from vinet_tpu.metrics.saliency import cc_score

    dtype = jnp.bfloat16 if dtype is None else dtype
    rows = []
    p_all, s_all, a_all = [], [], []
    for seed in seeds:
        frames, gts = make_eval_video(n_frames=n_frames, seed=seed)
        par = {i: m for i, m in SlidingWindowPredictor(
            model, params, state, clip_size=model.clip_size, batch=batch,
            dtype=dtype).predict_video(frames)}
        stm = {i: m for i, m in StreamingPredictor(
            model, params, state, clip_size=model.clip_size, batch=batch,
            chunk=chunk, dtype=dtype).predict_video(frames)}
        idx = list(range(0, n_frames, parity_stride))
        p_cc = [cc_score(par[i], gts[i]) for i in idx]
        s_cc = [cc_score(stm[i], gts[i]) for i in idx]
        a_cc = [cc_score(stm[i], par[i]) for i in idx]
        rows.append({"seed": seed,
                     "parity_cc": float(np.mean(p_cc)),
                     "streaming_cc": float(np.mean(s_cc)),
                     "agreement_cc": float(np.mean(a_cc))})
        p_all += p_cc
        s_all += s_cc
        a_all += a_cc
    return {
        "n_frames": n_frames,
        "parity_stride": parity_stride,
        "frames_scored": len(p_all),
        "parity_cc": float(np.mean(p_all)),
        "streaming_cc": float(np.mean(s_all)),
        "cc_delta": float(np.mean(s_all) - np.mean(p_all)),
        "agreement_cc": float(np.mean(a_all)),
        "videos": rows,
    }


def load_artifact(path, model):
    """Load a committed fixture checkpoint (bf16 npz) into f32 params/state."""
    import jax
    import jax.numpy as jnp

    from vinet_tpu.io.convert import load_npz_tree
    from vinet_tpu.models.inference import cast_floating

    params, state = model.init(jax.random.PRNGKey(0))
    params, state = load_npz_tree(path, params, state)
    return (cast_floating(params, jnp.float32),
            cast_floating(state, jnp.float32))
