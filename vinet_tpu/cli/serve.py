"""Multi-stream saliency serving CLI (inference/serving.py).

Serves S video streams CONCURRENTLY on one chip (or, with
--stream_parallel, sharded over all local devices): frames are fed
--live_micro at a time for all streams in lockstep and every map is
emitted with a constant pipeline lag — the production shape for a
camera/broadcast fleet, driven here from stored frame dirs so the whole
path is exercisable end-to-end (DHF1K layout <video>/images/*).

No reference counterpart: the reference serves one offline video per
process (/root/reference/generate_result.py) and scales by launching
processes (--start_idx/--num_parts). This replaces that with ONE program
batching S streams into one vmapped advance/decode pipeline
(inference/serving.py): S synchronized streams per chip at a roughly
constant total rate (~300 maps/s on a v5e, NOTES.md round 3), scaling
linearly over chips with --stream_parallel.

Grouping: streams in one server share frame geometry and advance in
lockstep, so videos are grouped by native frame size and served in
groups of --streams; shorter videos in a group are padded with their
last frame and the padding's maps are dropped. Maps use the same
window-edge semantics as --streaming/--live (fine-tune checkpoints with
train.py --streaming_ft before benchmark use).

Usage:
  python -m vinet_tpu.cli.serve --path_indata DIR --save_path OUT \
      --file_weight ViNet_DHF1K.pt --streams 4 [--live_micro 32]
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
    p.add_argument("--path_indata", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--streams", type=int, default=4,
                   help="concurrent streams per server instance")
    p.add_argument("--live_micro", type=int, default=32,
                   help="microbatch per stream (multiple of 8): larger = "
                        "higher aggregate throughput, +1 frame lag per frame")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--stream_parallel", action="store_true",
                   help="shard the stream axis over all local devices "
                        "(zero-communication scale-out; --streams must be a "
                        "multiple of the device count)")
    p.add_argument("--exact_quantize", action="store_true",
                   help="host f64 uint8 quantization instead of device f32")
    add_model_args(p)
    return p


def _native_size(frame_dir, frames):
    from PIL import Image

    with Image.open(join(frame_dir, frames[0])) as im:
        return im.size  # (w, h)


def run(args) -> int:
    from vinet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vinet_tpu.cli.common import build_model, load_weights, model_input_size
    from vinet_tpu.inference.serving import MultiLiveServer
    from vinet_tpu.io.images import load_frame, save_map

    model = build_model(args)
    params, state = model.init(jax.random.PRNGKey(0))
    if args.file_weight:
        params, state = load_weights(args.file_weight, model, params, state)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    stream_mesh = None
    if args.stream_parallel:
        from vinet_tpu.parallel import create_mesh

        stream_mesh = create_mesh()
        assert args.streams % stream_mesh.shape["data"] == 0, (
            args.streams, dict(stream_mesh.shape))

    span = max(160, ((96 + args.clip_size + 2 * args.live_micro + 7) // 8) * 8)
    server = MultiLiveServer(
        model, params, state, streams=args.streams, stream_mesh=stream_mesh,
        clip_size=args.clip_size, batch=min(32, args.live_micro),
        micro=args.live_micro, span=span, dtype=dtype)

    # ---- scan videos, group by native frame size (lockstep geometry) ----
    videos = sorted(d for d in os.listdir(args.path_indata)
                    if os.path.isdir(join(args.path_indata, d)))
    by_size: dict[tuple, list] = {}
    meta = {}
    for dname in videos:
        frame_dir = join(args.path_indata, dname, "images")
        frames = sorted(f for f in os.listdir(frame_dir)
                        if os.path.isfile(join(frame_dir, f)))
        if len(frames) < 2 * args.clip_size - 1:
            print(f"{dname}: more frames are needed", flush=True)
            continue
        size = _native_size(frame_dir, frames)
        meta[dname] = (frame_dir, frames)
        by_size.setdefault(size, []).append(dname)

    in_size = model_input_size(args)
    n_maps = 0
    with ThreadPoolExecutor(max_workers=8) as pool:
        for (w, h), group in sorted(by_size.items()):
            for lo in range(0, len(group), args.streams):
                chunk = group[lo:lo + args.streams]
                # fixed stream count: pad the chunk by repeating its last
                # video; the duplicate's maps are dropped below
                names = chunk + [chunk[-1]] * (args.streams - len(chunk))
                print("serving " + ", ".join(chunk), flush=True)
                lengths = [len(meta[n][1]) for n in names]
                t_max = max(lengths)

                def load_stream(name):
                    frame_dir, frames = meta[name]
                    clip = np.stack([load_frame(join(frame_dir, f),
                                                size=in_size)[0]
                                     for f in frames])
                    if clip.shape[0] < t_max:  # last-frame pad to lockstep
                        pad = np.repeat(clip[-1:],
                                        t_max - clip.shape[0], axis=0)
                        clip = np.concatenate([clip, pad])
                    return clip

                clips = np.stack(list(pool.map(load_stream, names)))
                for name in chunk:
                    os.makedirs(join(args.save_path, name), exist_ok=True)

                server.reset()
                server.start(out_size=(h, w),
                             quantize_u8=not args.exact_quantize)
                futures = []

                def sink(got):
                    nonlocal n_maps
                    for s, idx, smap in got:
                        if s >= len(chunk) or idx >= lengths[s]:
                            continue  # stream-pad / frame-pad output
                        name = names[s]
                        out = join(args.save_path, name, meta[name][1][idx])
                        futures.append(pool.submit(save_map, smap, out,
                                                   normalize=True))
                        n_maps += 1

                m = server.micro
                for flo in range(0, t_max, m):
                    sink(server.feed(clips[:, flo:flo + m]))
                sink(server.flush())  # drains the tail (last-frame padding)
                for f in futures:
                    f.result()
    print(f"wrote {n_maps} maps", flush=True)
    return 0


def main(argv=None):
    args = build_parser().parse_args(argv)
    return run(args)


if __name__ == "__main__":
    raise SystemExit(main())
