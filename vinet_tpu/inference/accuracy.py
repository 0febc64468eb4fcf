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


def evaluate_fixture_suite(model, params, state, *, kinds=None, n_frames=96,
                           seed=100, dtype=None, batch=16, chunk=128):
    """Score parity vs streaming on EVERY fixture kind (VERDICT r4 item 3:
    the accuracy claim must generalize beyond one synthetic video). Returns
    per-kind rows plus the aggregates the bench record carries:
    cc_delta_min (worst kind), cc_delta_mean, agreement_min."""
    import jax.numpy as jnp

    from vinet_tpu.data.synthetic import FIXTURE_KINDS, make_fixture_video
    from vinet_tpu.inference import SlidingWindowPredictor
    from vinet_tpu.inference.streaming import StreamingPredictor
    from vinet_tpu.metrics.saliency import cc_score

    dtype = jnp.bfloat16 if dtype is None else dtype
    kinds = FIXTURE_KINDS if kinds is None else kinds
    par_pred = SlidingWindowPredictor(model, params, state,
                                      clip_size=model.clip_size, batch=batch,
                                      dtype=dtype)
    stm_pred = StreamingPredictor(model, params, state,
                                  clip_size=model.clip_size, batch=batch,
                                  chunk=chunk, dtype=dtype)
    rows = []
    for kind in kinds:
        frames, gts = make_fixture_video(kind, n_frames=n_frames, seed=seed)
        par = {i: m for i, m in par_pred.predict_video(frames)}
        stm = {i: m for i, m in stm_pred.predict_video(frames)}
        p_cc = [cc_score(par[i], gts[i]) for i in range(n_frames)]
        s_cc = [cc_score(stm[i], gts[i]) for i in range(n_frames)]
        a_cc = [cc_score(stm[i], par[i]) for i in range(n_frames)]
        rows.append({"kind": kind,
                     "parity_cc": float(np.mean(p_cc)),
                     "streaming_cc": float(np.mean(s_cc)),
                     "cc_delta": float(np.mean(s_cc) - np.mean(p_cc)),
                     "agreement_cc": float(np.mean(a_cc))})
    deltas = [r["cc_delta"] for r in rows]
    return {
        "n_frames": n_frames,
        "fixtures": rows,
        "cc_delta_min": float(np.min(deltas)),
        "cc_delta_mean": float(np.mean(deltas)),
        "agreement_min": float(np.min([r["agreement_cc"] for r in rows])),
    }


def synthetic_audio_info(n_frames, *, fps=30.0, fs=22050, seed=0):
    """Deterministic synthetic waveform (chirp + noise) indexed like a real
    dataset wav — for AV fixture evaluation without audio files on disk."""
    from vinet_tpu.data.audio import AudioInfo, frame_sample_ranges

    n = int(n_frames / fps * fs) + fs // 10
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64) / fs
    wav = (0.05 * np.sin(2 * np.pi * (220 + 40 * t) * t)
           + 0.01 * rng.standard_normal(n)).astype(np.float32)[None]
    starts, ends = frame_sample_ranges(n, n_frames, fs, fps)
    return AudioInfo(wav=wav, fs=fs, starts=starts, ends=ends)


def evaluate_av_agreement(model, params, state, *, kinds=None, n_frames=96,
                          seed=100, dtype=None, batch=16, chunk=128):
    """Streaming-vs-parity AGREEMENT for the AV model on the fixture suite:
    both modes run the SAME AViNet weights with per-window audio excerpts
    (reference semantics generate_result_audio_visual.py:186-230), so
    agreement isolates the window-edge mode gap — the quantity streaming-FT
    must preserve when audio is fused per window. (Absolute GT-CC is not
    reported here: the committed artifact is a visual checkpoint, so the
    fusion branch is seeded-init, and GT-CC of an untrained fusion is
    noise.) Returns per-kind agreement rows + agreement_min/mean."""
    import jax.numpy as jnp

    from vinet_tpu.data.audio import audio_excerpt
    from vinet_tpu.data.synthetic import FIXTURE_KINDS, make_fixture_video
    from vinet_tpu.inference import SlidingWindowPredictor
    from vinet_tpu.inference.streaming import AVStreamingPredictor
    from vinet_tpu.metrics.saliency import cc_score

    dtype = jnp.bfloat16 if dtype is None else dtype
    kinds = FIXTURE_KINDS if kinds is None else kinds
    par_pred = SlidingWindowPredictor(model, params, state,
                                      clip_size=model.clip_size, batch=batch,
                                      dtype=dtype)
    stm_pred = AVStreamingPredictor(model, params, state,
                                    clip_size=model.clip_size, batch=batch,
                                    chunk=chunk, dtype=dtype)
    rows = []
    for k_i, kind in enumerate(kinds):
        frames, _ = make_fixture_video(kind, n_frames=n_frames, seed=seed)
        info = synthetic_audio_info(n_frames, seed=k_i)
        audio_fn = lambda s: audio_excerpt(info, model.clip_size, s)
        par = {i: m for i, m in par_pred.predict_video(frames, audio_fn=audio_fn)}
        stm = {i: m for i, m in stm_pred.predict_video(frames, audio_fn=audio_fn)}
        a_cc = [cc_score(stm[i], par[i]) for i in range(n_frames)]
        rows.append({"kind": kind, "agreement_cc": float(np.mean(a_cc))})
    return {
        "n_frames": n_frames,
        "fixtures": rows,
        "agreement_min": float(np.min([r["agreement_cc"] for r in rows])),
        "agreement_mean": float(np.mean([r["agreement_cc"] for r in rows])),
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
