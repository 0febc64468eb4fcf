"""Audio-visual sliding-window inference CLI
(reference: generate_result_audio_visual.py).

STAViS-layout datasets: fold lists name the videos; frames live under
<frames_root>/<DS>/<video>/img_%05d.jpg; audio under
<audio_root>/<DS>/<video>/<video>.wav. Each window gets its Hanning-windowed
audio excerpt; warmup windows flip BOTH the clip and the audio in-graph
(reference :192-194). Maps are saved as jpg (quality 100) for eval_diem.

Usage:
  python -m vinet_tpu.cli.generate_result_audio_visual \
      --path_data ROOT --dataset DIEM --split -1 \
      --file_weight AViNet_DIEM.pt --save_path OUT --use_sound True
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def build_parser():
    from vinet_tpu.cli.common import add_model_args

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--file_weight", type=str, default=None)
    p.add_argument("--path_data", type=str, required=True,
                   help="STAViS root containing fold_lists/, video_frames/, "
                        "video_audio/, annotations/")
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--dataset", type=str, default="DIEM")
    p.add_argument("--split", type=int, default=-1)
    p.add_argument("--mode", type=str, default="test")
    p.add_argument("--fps_json", type=str, default=None,
                   help="DAVE-style {video: fps} json instead of a fold list "
                        "(reference generate_result_dave.py:24-32)")
    p.add_argument("--start_idx", type=int, default=-1)
    p.add_argument("--num_parts", type=int, default=4)
    p.add_argument("--window_batch", type=int, default=16)
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--streaming", action="store_true",
                   help="whole-video streaming encoder: shared visual "
                        "timelines + per-window audio fusion (~same speedup "
                        "as generate_result --streaming; window-edge padding "
                        "semantics differ slightly from the reference)")
    p.add_argument("--live", action="store_true",
                   help="drive the LIVE incremental server (inference/live.py"
                        " AVLiveStreamingPredictor): frames+audio samples fed "
                        "--live_micro frames at a time, maps emitted with a "
                        "constant ~57-frame pipeline lag — the serving mode "
                        "for camera/broadcast AV sources, run here over "
                        "stored videos to exercise it end-to-end")
    p.add_argument("--live_micro", type=int, default=16)
    p.add_argument("--exact_quantize", action="store_true",
                   help="host f64 uint8 quantization (bit-exact reference "
                        "img_save rounding) instead of device f32")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard window batches across all local devices over a "
                        "jax Mesh 'data' axis (exact)")
    add_model_args(p)
    return p


def run(args) -> int:
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vinet_tpu.cli.common import build_model, load_weights, model_input_size, shard_video_list
    from vinet_tpu.data.audio import audio_excerpt, build_audio_index
    from vinet_tpu.data.datasets import read_fold_list
    from vinet_tpu.inference import SlidingWindowPredictor
    from vinet_tpu.io.images import load_frame, save_map

    model = build_model(args)
    params, state = model.init(jax.random.PRNGKey(0))
    if args.file_weight:
        params, state = load_weights(args.file_weight, model, params, state)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    mesh = None
    if getattr(args, "data_parallel", False):
        from vinet_tpu.parallel import create_mesh

        mesh = create_mesh()
    if getattr(args, "live", False):
        assert not (getattr(args, "streaming", False) or mesh), \
            "--live excludes --streaming/--data_parallel"
        from vinet_tpu.inference.live import (AVLiveStreamingPredictor,
                                              LiveStreamingPredictor)

        span = max(160, ((96 + args.clip_size + 2 * args.live_micro + 7) // 8) * 8)
        cls = AVLiveStreamingPredictor if args.use_sound else LiveStreamingPredictor
        predictor = cls(
            model, params, state, clip_size=args.clip_size,
            batch=min(16, args.live_micro), micro=args.live_micro, span=span,
            dtype=dtype)
    elif getattr(args, "streaming", False) and args.use_sound:
        from vinet_tpu.inference.streaming import AVStreamingPredictor

        predictor = AVStreamingPredictor(
            model, params, state, clip_size=args.clip_size,
            batch=args.window_batch, dtype=dtype, mesh=mesh)
    elif getattr(args, "streaming", False):
        from vinet_tpu.inference.streaming import StreamingPredictor

        predictor = StreamingPredictor(
            model, params, state, clip_size=args.clip_size,
            batch=args.window_batch, dtype=dtype, mesh=mesh)
    else:
        predictor = SlidingWindowPredictor(
            model, params, state, clip_size=args.clip_size, batch=args.window_batch,
            dtype=dtype, mesh=mesh,
        )

    if getattr(args, "fps_json", None):
        from vinet_tpu.data.datasets import read_fps_json

        data = read_fps_json(args.fps_json)
    elif args.dataset == "DIEM":
        fold = f"DIEM_list_{args.mode}_fps.txt"
        data = read_fold_list(join(args.path_data, "fold_lists", fold))
    else:
        fold = f"{args.dataset}_list_{args.mode}_{args.split}_fps.txt"
        data = read_fold_list(join(args.path_data, "fold_lists", fold))
    videos = shard_video_list(sorted(data["names"]), args.start_idx, args.num_parts)
    fps = dict(zip(data["names"], data["fps"]))

    audio_index = {}
    if args.use_sound:
        nframes = {}
        for v in videos:
            d = join(args.path_data, "video_frames", args.dataset, v)
            nframes[v] = len(os.listdir(d)) if os.path.isdir(d) else 0
        audio_index = build_audio_index(
            videos, nframes, fps, join(args.path_data, "video_audio", args.dataset),
            gt_root=join(args.path_data, "annotations", args.dataset),
        )

    def emit_maps(clip_u8, out_size, audio_fn, v_fps, wav):
        if not getattr(args, "live", False):
            yield from predictor.predict_video(
                clip_u8, out_size=out_size, audio_fn=audio_fn,
                quantize_u8=not args.exact_quantize)
            return
        predictor.reset()
        kw = {"fps": v_fps} if args.use_sound else {}
        predictor.start(out_size=out_size,
                        quantize_u8=not args.exact_quantize, **kw)
        m = predictor.micro
        if args.use_sound and wav is not None:
            # samples aligned to frames by cumulative count (stream clock)
            spf = predictor.audio_fs / v_fps
            for lo in range(0, len(clip_u8), m):
                a = wav[int(lo * spf): int((lo + m) * spf)]
                yield from predictor.feed(clip_u8[lo:lo + m], audio=a)
            yield from predictor.feed(
                np.zeros((0, *clip_u8.shape[1:]), np.uint8),
                audio=wav[int(len(clip_u8) * spf):])
        else:
            for lo in range(0, len(clip_u8), m):
                yield from predictor.feed(clip_u8[lo:lo + m])
        yield from predictor.flush()

    n_maps = 0
    with ThreadPoolExecutor(max_workers=8) as pool:
        for v in videos:
            frame_dir = join(args.path_data, "video_frames", args.dataset, v)
            frames = sorted(os.listdir(frame_dir))
            if len(frames) < 2 * args.clip_size - 1:
                print(f"{v}: more frames are needed", flush=True)
                continue
            print(f"processing {v}", flush=True)
            os.makedirs(join(args.save_path, v), exist_ok=True)
            decoded = list(pool.map(lambda f: load_frame(join(frame_dir, f), size=model_input_size(args)), frames))
            clip_u8 = np.stack([d[0] for d in decoded])
            orig_w, orig_h = decoded[0][1]

            audio_fn, wav = None, None
            if args.use_sound:
                info = audio_index.get(v)
                audio_fn = lambda start, _info=info: audio_excerpt(_info, args.clip_size, start)
                wav = info.wav[0] if info is not None else None

            futures = []
            for frame_idx, smap in emit_maps(
                clip_u8, (orig_h, orig_w), audio_fn, fps[v], wav,
            ):
                out = join(args.save_path, v, os.path.splitext(frames[frame_idx])[0] + ".jpg")
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
