"""Synthetic mini-dataset builders for end-to-end tests (SURVEY.md §4(e)).

Videos are procedurally generated: a bright moving blob over noise, with GT
saliency maps that follow the blob — so trained-for-a-few-steps models and
metrics have real signal to latch onto.
"""

from __future__ import annotations

import os
from os.path import join

import numpy as np
from PIL import Image


def _blob_frame(h, w, cy, cx, rng, sigma=6.0):
    y, x = np.mgrid[0:h, 0:w]
    g = np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * sigma**2))
    img = rng.integers(0, 80, (h, w, 3)).astype(np.float64)
    img += 175.0 * g[..., None]
    return np.clip(img, 0, 255).astype(np.uint8), (255.0 * g).astype(np.uint8)


def make_dhf1k(root, *, n_videos=2, n_frames=70, size=(64, 96), seed=0):
    """DHF1K layout: <root>/<video>/images/%04d.png + maps/%04d.png (+ a
    binary fixation/ dir for metric tests)."""
    rng = np.random.default_rng(seed)
    h, w = size
    for v in range(n_videos):
        vdir = join(root, "%03d" % (v + 1))
        os.makedirs(join(vdir, "images"), exist_ok=True)
        os.makedirs(join(vdir, "maps"), exist_ok=True)
        os.makedirs(join(vdir, "fixation"), exist_ok=True)
        cy, cx = h // 2, w // 4
        for f in range(1, n_frames + 1):
            cy = int(np.clip(cy + rng.integers(-2, 3), 8, h - 8))
            cx = int(np.clip(cx + 1, 8, w - 8))
            img, gt = _blob_frame(h, w, cy, cx, rng)
            Image.fromarray(img).save(join(vdir, "images", "%04d.png" % f))
            Image.fromarray(gt).save(join(vdir, "maps", "%04d.png" % f))
            fix = np.zeros((h, w), np.uint8)
            fix[cy, cx] = 255
            fix[min(cy + 2, h - 1), min(cx + 1, w - 1)] = 255
            Image.fromarray(fix).save(join(vdir, "fixation", "%04d.png" % f))
    return root


def make_sound_dataset(root, *, dataset="DIEM", n_videos=1, n_frames=40,
                       size=(64, 96), fps=10.0, seed=0):
    """STAViS layout with fold lists, frames, eyeMaps and a wav per video."""
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    h, w = size
    os.makedirs(join(root, "fold_lists"), exist_ok=True)
    names = []
    for v in range(n_videos):
        name = f"vid{v:02d}"
        names.append(name)
        fdir = join(root, "video_frames", dataset, name)
        adir = join(root, "annotations", dataset, name, "maps")
        wdir = join(root, "video_audio", dataset, name)
        os.makedirs(fdir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        os.makedirs(wdir, exist_ok=True)
        cy, cx = h // 2, w // 3
        for f in range(1, n_frames + 1):
            cy = int(np.clip(cy + rng.integers(-2, 3), 8, h - 8))
            img, gt = _blob_frame(h, w, cy, cx, rng)
            Image.fromarray(img).save(join(fdir, "img_%05d.jpg" % f))
            Image.fromarray(gt).save(join(adir, "eyeMap_%05d.jpg" % f))
            fix = np.zeros((h, w), np.float64)
            fix[cy, cx] = 1
            fix[min(cy + 2, h - 1), min(cx + 2, w - 1)] = 1
            from scipy.io import savemat

            savemat(join(root, "annotations", dataset, name, "fixMap_%05d.mat" % f),
                    {"eyeMap": fix})
        n_samples = int(22050 * n_frames / fps)
        wav = (1000 * np.sin(np.linspace(0, 800, n_samples))).astype(np.int16)
        wavfile.write(join(wdir, f"{name}.wav"), 22050, wav)

    for mode in ("train", "test", "val"):
        for split in (1, 2, 3):
            fname = (f"{dataset}_list_{mode}_fps.txt" if dataset == "DIEM"
                     else f"{dataset}_list_{mode}_{split}_fps.txt")
            with open(join(root, "fold_lists", fname), "w") as fh:
                for name in names:
                    fh.write(f"{name} {n_frames} {fps}\n")
    return root, names
