"""Raw-footage AV inference (reference: generate_theatre.py).

Layout: <path_indata>/fps.json ({video: fps}), video_frames/<video>/*,
video_audio/<video>.wav (flat, any sample rate — resampled to 22050 Hz; the
reference used torchaudio sinc resampling, generate_theatre.py:46-49; here
scipy polyphase). The reference computes audio frame ranges with the
PRE-resample rate on the POST-resample waveform (generate_theatre.py:52-60, a
bug that scrambles windows whenever Fs != 22050) — fixed here: ranges use the
resampled rate.

Usage:
  python -m vinet_tpu.cli.generate_theatre --path_indata ROOT \
      --file_weight AViNet.pt --save_path OUT --use_sound True
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from concurrent.futures import ThreadPoolExecutor
from fractions import Fraction
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def build_parser():
    from vinet_tpu.cli.common import add_model_args

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--file_weight", type=str, default=None)
    p.add_argument("--path_indata", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--start_idx", type=int, default=-1)
    p.add_argument("--num_parts", type=int, default=4)
    p.add_argument("--window_batch", type=int, default=16)
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["bfloat16", "float32"])
    add_model_args(p)
    return p


def _load_resampled_wav(path: str, target_fs: int = 22050):
    from scipy.signal import resample_poly

    from vinet_tpu.data.audio import load_wav_raw

    wav, fs = load_wav_raw(path)
    if fs != target_fs:
        frac = Fraction(target_fs, fs).limit_denominator(1000)
        wav = resample_poly(wav, frac.numerator, frac.denominator, axis=1).astype(np.float32)
    return wav, target_fs


def run(args) -> int:
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vinet_tpu.cli.common import build_model, load_weights, model_input_size, shard_video_list
    from vinet_tpu.data.audio import AudioInfo, audio_excerpt, frame_sample_ranges
    from vinet_tpu.inference import SlidingWindowPredictor
    from vinet_tpu.io.images import load_frame, save_map

    model = build_model(args)
    params, state = model.init(jax.random.PRNGKey(0))
    if args.file_weight:
        params, state = load_weights(args.file_weight, model, params, state)
    predictor = SlidingWindowPredictor(
        model, params, state, clip_size=args.clip_size, batch=args.window_batch,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )

    with open(join(args.path_indata, "fps.json")) as f:
        video_fps = json.load(f)
    videos = shard_video_list(sorted(video_fps), args.start_idx, args.num_parts)

    n_maps = 0
    with ThreadPoolExecutor(max_workers=8) as pool:
        for v in videos:
            frame_dir = join(args.path_indata, "video_frames", v)
            frames = sorted(f for f in os.listdir(frame_dir)
                            if os.path.isfile(join(frame_dir, f)))
            if len(frames) < 2 * args.clip_size - 1:
                print(f"{v}: more frames are needed", flush=True)
                continue
            print(f"processing {v}", flush=True)
            os.makedirs(join(args.save_path, v), exist_ok=True)

            audio_fn = None
            if args.use_sound:
                wav_path = join(args.path_indata, "video_audio", f"{v}.wav")
                info = None
                if os.path.exists(wav_path):
                    wav, fs = _load_resampled_wav(wav_path)
                    starts, ends = frame_sample_ranges(
                        wav.shape[1], len(frames), fs, float(video_fps[v]))
                    info = AudioInfo(wav=wav, fs=fs, starts=starts, ends=ends)
                audio_fn = lambda start, _info=info: audio_excerpt(_info, args.clip_size, start)

            decoded = list(pool.map(
                lambda f: load_frame(join(frame_dir, f), size=model_input_size(args)), frames))
            clip_u8 = np.stack([d[0] for d in decoded])
            orig_w, orig_h = decoded[0][1]

            futures = []
            for frame_idx, smap in predictor.predict_video(
                clip_u8, out_size=(orig_h, orig_w), audio_fn=audio_fn
            ):
                out = join(args.save_path, v, frames[frame_idx])
                futures.append(pool.submit(save_map, smap, out, normalize=True))
                n_maps += 1
            for f in futures:
                f.result()
    print(f"wrote {n_maps} maps", flush=True)
    return 0


def main(argv=None):
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
