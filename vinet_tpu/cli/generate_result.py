"""Visual-only sliding-window inference CLI (reference: generate_result.py).

Per video dir under --path_indata (DHF1K layout <video>/images/*), predicts a
saliency map for every frame with the causal sliding window + flipped warmup
(/root/reference/generate_result.py:58-73), resized to the native frame size,
blurred, min-max normalized, and saved as PNG under --save_path/<video>/.

TPU-native differences: windows run batched (--window_batch) in bf16 with
folded BN; resize+blur run on device. Flag-compatible --start_idx/--num_parts
process sharding is kept.

Usage:
  python -m vinet_tpu.cli.generate_result --path_indata DIR --save_path OUT \
      --file_weight ViNet_DHF1K.pt [--clip_size 32] [--num_hier 3]
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
    p.add_argument("--file_weight", type=str, default=None,
                   help=".pt (torch, converted on load) or .npz weights; "
                        "omit for random init (smoke tests)")
    p.add_argument("--path_indata", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--start_idx", type=int, default=-1)
    p.add_argument("--num_parts", type=int, default=4)
    p.add_argument("--window_batch", type=int, default=16)
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--pad_short", action="store_true",
                   help="pad videos shorter than 2*clip_size-1 by repeating the "
                        "first frame (Hollywood/UCF semantics) instead of skipping")
    p.add_argument("--streaming", action="store_true",
                   help="whole-video streaming encoder: computes the backbone "
                        "once per chunk instead of per window (~3x faster but "
                        "NOT output-equivalent: windows see real temporal "
                        "neighbors instead of the reference's zero padding. "
                        "Measured on a trained model: CC-vs-GT 0.53 vs the "
                        "default mode's 0.80 on a tracking fixture. "
                        "Fine-tune the checkpoint with train.py "
                        "--streaming_ft first: that recovers most of the gap "
                        "(0.76 streaming / 0.83 parity, same checkpoint) — "
                        "see NOTES.md round 3 before using for benchmark "
                        "submissions)")
    p.add_argument("--chunk", type=int, default=128,
                   help="streaming chunk length in frames (multiple of 8)")
    p.add_argument("--live", action="store_true",
                   help="drive the LIVE incremental server (inference/live.py)"
                        ": frames are fed --live_micro at a time and each map "
                        "is emitted with a constant ~57-frame pipeline lag — "
                        "the serving mode for camera/broadcast sources, run "
                        "here over stored frames to exercise it end-to-end. "
                        "Same window-edge semantics as --streaming (fine-tune "
                        "with --streaming_ft before benchmark use)")
    p.add_argument("--live_micro", type=int, default=16,
                   help="live microbatch (multiple of 8): smaller = lower "
                        "latency, larger = higher throughput")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard window batches across all local devices over a "
                        "jax Mesh 'data' axis (exact; supersedes launching "
                        "--num_parts processes on a multi-chip host)")
    p.add_argument("--exact_quantize", action="store_true",
                   help="quantize maps to uint8 on the host in f64 (bit-exact "
                        "reference img_save rounding) instead of on device in "
                        "f32 (4x smaller transfers; can differ by 1 gray level "
                        "on rounding ties)")
    add_model_args(p)
    return p


def run(args) -> int:
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from vinet_tpu.cli.common import build_model, load_weights, model_input_size, shard_video_list
    from vinet_tpu.inference import SlidingWindowPredictor
    from vinet_tpu.io.images import load_frame, save_map

    model = build_model(args)
    import jax

    params, state = model.init(jax.random.PRNGKey(0))
    if args.file_weight:
        params, state = load_weights(args.file_weight, model, params, state)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    mesh = None
    if args.data_parallel:
        from vinet_tpu.parallel import create_mesh

        mesh = create_mesh()
    if args.live:
        assert not (args.streaming or args.pad_short or mesh), \
            "--live excludes --streaming/--pad_short/--data_parallel"
        from vinet_tpu.inference.live import LiveStreamingPredictor

        span = max(160, ((96 + args.clip_size + 2 * args.live_micro + 7) // 8) * 8)
        predictor = LiveStreamingPredictor(
            model, params, state, clip_size=args.clip_size,
            batch=min(16, args.live_micro), micro=args.live_micro, span=span,
            dtype=dtype,
        )
    elif args.streaming:
        from vinet_tpu.inference.streaming import StreamingPredictor

        predictor = StreamingPredictor(
            model, params, state, clip_size=args.clip_size,
            batch=args.window_batch, chunk=args.chunk, dtype=dtype, mesh=mesh,
        )
    else:
        predictor = SlidingWindowPredictor(
            model, params, state, clip_size=args.clip_size,
            batch=args.window_batch, dtype=dtype, mesh=mesh,
        )

    def emit_maps(clip_u8, out_size):
        if args.live:
            predictor.reset()
            predictor.start(out_size=out_size,
                            quantize_u8=not args.exact_quantize)
            m = predictor.micro
            for lo in range(0, len(clip_u8), m):
                yield from predictor.feed(clip_u8[lo:lo + m])
            yield from predictor.flush()
        else:
            yield from predictor.predict_video(
                clip_u8, out_size=out_size, pad_short=args.pad_short,
                # device u8 quantization: 4x smaller transfers (differs from
                # host f64 by <=1/255 on ties; --exact_quantize opts out)
                quantize_u8=not args.exact_quantize)

    videos = sorted(
        d for d in os.listdir(args.path_indata)
        if os.path.isdir(join(args.path_indata, d))
    )
    videos = shard_video_list(videos, args.start_idx, args.num_parts)

    n_maps = 0
    with ThreadPoolExecutor(max_workers=8) as pool:
        for dname in videos:
            print(f"processing {dname}", flush=True)
            frame_dir = join(args.path_indata, dname, "images")
            frames = sorted(
                f for f in os.listdir(frame_dir) if os.path.isfile(join(frame_dir, f))
            )
            if len(frames) < 2 * args.clip_size - 1 and not args.pad_short:
                print(" more frames are needed", flush=True)
                continue
            os.makedirs(join(args.save_path, dname), exist_ok=True)

            decoded = list(pool.map(lambda f: load_frame(join(frame_dir, f), size=model_input_size(args)), frames))
            clip_u8 = np.stack([d[0] for d in decoded])
            orig_w, orig_h = decoded[0][1]

            futures = []
            for frame_idx, smap in emit_maps(clip_u8, (orig_h, orig_w)):
                # keep the frame's own filename/extension (reference img_save
                # writes png as png, jpg at quality 100)
                out_path = join(args.save_path, dname, frames[frame_idx])
                futures.append(pool.submit(save_map, smap, out_path, normalize=True))
                n_maps += 1
            for f in futures:
                f.result()
    print(f"wrote {n_maps} maps", flush=True)
    return 0


def main(argv=None):
    args = build_parser().parse_args(argv)
    return run(args)


if __name__ == "__main__":
    raise SystemExit(main())
