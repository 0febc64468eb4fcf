"""Batched sliding-window saliency inference.

The reference predicts one frame per full model call in a Python loop
(generate_result.py:58-73): clip assembly on host, one window per forward.
Causal semantics per frame i: predict from frames [i-T+1 .. i]; the first
T-1 frames are predicted from time-FLIPPED clips ending at that frame
(torch.flip(clip, [2]), generate_result.py:69-71), so every frame gets a map
while staying causal-shaped. Videos shorter than 2T-1 frames are skipped
(generate_result.py:55) unless `pad_short` (the Hollywood/UCF variant pads by
repeating the first frame, generate_result_hollywood_ucf.py:55-62).

TPU-native engine: the whole video's frames live on device as one uint8
array; windows are gathered by index and run B-at-a-time through a single
jitted program that also normalizes, runs the model, resizes every map to the
video's native size, and Gaussian-blurs — host work is only PNG decode/encode.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from vinet_tpu.data.pipeline import device_preprocess
from vinet_tpu.models.inference import cast_floating, fold_batchnorms
from vinet_tpu.ops.image import gaussian_blur


@dataclasses.dataclass(frozen=True)
class WindowTask:
    out_frame: int  # index of the frame this window predicts
    start: int  # first frame index of the window
    flipped: bool


def window_plan(n_frames: int, clip_size: int, *, pad_short: bool = False) -> list:
    """All (out_frame, start, flipped) windows for a video, in the reference's
    emission order. Returns [] for videos that are too short without padding."""
    t = clip_size
    if n_frames < 2 * t - 1 and not pad_short:
        return []
    plan = []
    for i in range(n_frames):
        if i >= t - 1:
            plan.append(WindowTask(i, i - t + 1, False))
            if i < 2 * t - 2:
                plan.append(WindowTask(i - t + 1, i - t + 1, True))
    return plan


class SlidingWindowPredictor:
    def __init__(self, model, params, state, *, clip_size: int = 32, batch: int = 16,
                 dtype=jnp.bfloat16, blur_ksize: int = 11, fold: bool = True,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh — window batches are sharded over
        its "data" axis (GSPMD data-parallel inference; exact vs single
        device, tests/test_inference_sharded.py). batch must be divisible by
        the data axis size. The reference's only inference parallelism is
        manual process sharding (generate_result.py:44-46); this is the
        mesh-native counterpart."""
        if fold:
            params, state = fold_batchnorms(params, state)
        self.params = cast_floating(params, dtype)
        self.state = cast_floating(state, dtype)
        self.model = model
        self.clip_size = clip_size
        self.batch = batch
        self.dtype = dtype
        self.blur_ksize = blur_ksize
        self.mesh = mesh
        if mesh is not None:
            assert batch % mesh.shape["data"] == 0, (batch, dict(mesh.shape))
        self._jitted = {}

    def _shard_batch_axis(self, x):
        """Sharding constraint: leading (window-batch) axis over "data"."""
        if self.mesh is None:
            return x
        from vinet_tpu.parallel.mesh import batch_sharding

        return jax.lax.with_sharding_constraint(x, batch_sharding(self.mesh))

    def _gather_fn(self):
        """Jitted (frames_u8, idx, flip) -> normalized clips in compute dtype.
        Kept as its OWN program: fusing the dynamic uint8 gather into the
        model program makes XLA produce a catastrophically slow executable on
        TPU (~90 s/batch observed vs milliseconds split)."""
        if "gather" in self._jitted:
            return self._jitted["gather"]

        def run(frames_u8, idx, flip):
            idx = self._shard_batch_axis(idx)
            clips = frames_u8[idx]  # (B, T, H, W, 3) gather
            # time-flip where requested (warmup windows)
            clips = jnp.where(flip[:, None, None, None, None], clips[:, ::-1], clips)
            return self._shard_batch_axis(device_preprocess(clips).astype(self.dtype))

        fn = jax.jit(run)
        self._jitted["gather"] = fn
        return fn

    def _model_fn(self):
        """Jitted clips[, audio] -> model-res f32 maps. Compiled once per
        (batch, clip) shape — independent of video native size."""
        if "model" in self._jitted:
            return self._jitted["model"]

        def run(x, flip, audio=None):
            from vinet_tpu.models.inference import _infer_lower2d_area
            from vinet_tpu.ops.conv import force_lower2d

            x = self._shard_batch_axis(x)
            with force_lower2d(_infer_lower2d_area()):
                if audio is None:
                    maps, _ = self.model.apply(self.params, self.state, x)
                else:
                    aud = self._shard_batch_axis(audio.astype(self.dtype))
                    aud = jnp.where(flip[:, None, None], aud[:, ::-1], aud)
                    maps, _ = self.model.apply(self.params, self.state, x, aud)
            return self._shard_batch_axis(maps.astype(jnp.float32))

        fn = jax.jit(run)
        self._jitted["model"] = fn
        return fn

    def _post_fn(self, out_hw: tuple, quantize_u8: bool = False):
        """Jitted maps -> native-size blurred maps (optionally img_save
        uint8-quantized on device — 4x smaller transfers); cached per
        (output size, quantize)."""
        key = (out_hw, quantize_u8)
        if key in self._jitted:
            return self._jitted[key]

        def post(maps):
            maps = self._shard_batch_axis(maps)
            if out_hw != maps.shape[1:]:
                maps = jax.image.resize(
                    maps, (maps.shape[0], *out_hw), method="bilinear", antialias=False
                )
            maps = gaussian_blur(maps, ksize=self.blur_ksize)
            if quantize_u8:
                from vinet_tpu.ops.image import quantize_maps_u8

                maps = quantize_maps_u8(maps)
            return maps

        fn = jax.jit(post)
        self._jitted[key] = fn
        return fn

    def predict_video(self, frames_u8: np.ndarray, *, out_size=None, pad_short=False,
                      audio_fn=None, quantize_u8=False):
        """frames_u8: (N, H, W, 3) uint8 model-sized frames. Yields
        (frame_index, map (out_h, out_w) float32) for every predictable frame.

        audio_fn(start_idx) -> (L, 1) float32 supplies the per-window audio
        excerpt for AViNet models (flip handled in-graph for warmup windows).
        """
        n = frames_u8.shape[0]
        t = self.clip_size
        if n < 2 * t - 1 and pad_short:
            pad = np.repeat(frames_u8[:1], 2 * t - 1 - n, axis=0)
            offset = pad.shape[0]
            frames_u8 = np.concatenate([pad, frames_u8], axis=0)
        else:
            offset = 0
        plan = window_plan(frames_u8.shape[0], t)
        if not plan:
            return
        out_hw = tuple(out_size) if out_size is not None else frames_u8.shape[1:3]
        gather = self._gather_fn()
        fn = self._model_fn()
        post = self._post_fn(out_hw, quantize_u8)
        frames_dev = jax.device_put(frames_u8)

        # device->host transfers are the wall-clock bottleneck through the
        # tunnel (~30 ms RTT each): keep maps on device and fetch several
        # batches per round trip
        pending = []  # (tasks, device_maps)

        def flush():
            if not pending:
                return
            fetched = np.asarray(jnp.concatenate([m for _, m in pending], axis=0))
            k = 0
            for tasks, m in pending:
                for j, task in enumerate(tasks):
                    out_frame = task.out_frame - offset
                    if out_frame >= 0:
                        yield out_frame, fetched[k + j]
                k += m.shape[0]
            pending.clear()

        for lo in range(0, len(plan), self.batch):
            chunk = plan[lo : lo + self.batch]
            pad_n = self.batch - len(chunk)
            idx = np.zeros((self.batch, t), np.int32)
            flip = np.zeros((self.batch,), bool)
            for j, task in enumerate(chunk):
                idx[j] = np.arange(task.start, task.start + t)
                flip[j] = task.flipped
            audio = None
            if audio_fn is not None:
                audio = np.stack(
                    [audio_fn(max(0, task.start - offset)) for task in chunk]
                    + [np.zeros_like(audio_fn(0))] * pad_n
                )
            flip_d = jnp.asarray(flip)
            clips = gather(frames_dev, jnp.asarray(idx), flip_d)
            maps = fn(clips, flip_d,
                      *((jnp.asarray(audio),) if audio is not None else ()))
            pending.append((chunk, post(maps)))
            if len(pending) >= 4:
                yield from flush()
        yield from flush()
