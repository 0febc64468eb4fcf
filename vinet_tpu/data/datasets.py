"""Dataset window samplers: DHF1K, Hollywood-2/UCF, and the six AV datasets.

Sampling semantics match the reference's torch Datasets
(/root/reference/dataloader.py:124-391): same directory layouts, window
strides, GT-frame selection, short-video padding, and zero-GT rejection —
but instead of torch DataLoader worker processes, samples are plain numpy
(uint8 frames, float32 GT) produced by a thread-pool Loader
(vinet_tpu/data/pipeline.py) and normalized on device.

An item is a dict: {"clip": (T,H,W,3) uint8, "gt": (H,W) or (Cl,H,W) f32,
optional "audio": (70560, 1) f32}.
"""

from __future__ import annotations

import copy
import json
import os
from os.path import join

import numpy as np

from vinet_tpu.data.audio import audio_excerpt, build_audio_index
from vinet_tpu.io.images import load_frame, load_map

AV_DATASETS = ("DIEM", "Coutrot_db1", "Coutrot_db2", "AVAD", "ETMD_av", "SumMe")


def read_fold_list(txt_file: str) -> dict:
    """Parse 'name nframes fps' lines (reference read_sal_text,
    dataloader.py:15-23)."""
    out = {"names": [], "nframes": [], "fps": []}
    with open(txt_file) as f:
        for line in f:
            w = line.strip().split()
            if not w:
                continue
            out["names"].append(w[0])
            out["nframes"].append(int(w[1]) if len(w) > 1 else 0)
            out["fps"].append(float(w[2]) if len(w) > 2 else 0.0)
    return out


def read_fps_json(json_file: str) -> dict:
    """Parse a DAVE-style {video: fps} map (reference read_sal_text_dave,
    dataloader.py:25-34)."""
    with open(json_file) as f:
        d = json.load(f)
    return {"names": list(d.keys()), "nframes": [0] * len(d), "fps": [float(v) for v in d.values()]}


class DHF1KDataset:
    """DHF1K layout: <root>/<video>/images/%04d.png + maps/%04d.png.

    train: one random window per video, GT = LAST frame's map at (224,384).
    val: deterministic windows strided 4*T, native-res GT.
    save: windows strided T plus a tail window; returns metadata, no GT.
    alternate=k subsamples every k-th frame (reference dataloader.py:235-308).
    """

    def __init__(self, path_data, len_snippet, mode="train", multi_frame=0, alternate=1):
        self.path_data = path_data
        self.len_snippet = len_snippet
        self.mode = mode
        self.multi_frame = multi_frame
        self.alternate = alternate
        if mode == "train":
            self.video_names = sorted(os.listdir(path_data))
            self.list_num_frame = [
                len(os.listdir(join(path_data, v, "images"))) for v in self.video_names
            ]
        else:
            self.list_num_frame = []
            for v in sorted(os.listdir(path_data)):
                n = len(os.listdir(join(path_data, v, "images")))
                span = alternate * len_snippet
                if mode == "val":
                    for i in range(0, n - span, 4 * len_snippet):
                        self.list_num_frame.append((v, i))
                else:  # save
                    for i in range(0, n - span, len_snippet):
                        self.list_num_frame.append((v, i))
                    self.list_num_frame.append((v, max(0, n - len_snippet)))

    def __len__(self):
        return len(self.list_num_frame)

    def get(self, idx, rng: np.random.Generator):
        if self.mode == "train":
            name = self.video_names[idx]
            hi = self.list_num_frame[idx] - self.alternate * self.len_snippet + 1
            start = int(rng.integers(0, max(1, hi)))
        else:
            name, start = self.list_num_frame[idx]

        path_clip = join(self.path_data, name, "images")
        path_annt = join(self.path_data, name, "maps")
        clip, gts, size = [], [], None
        for i in range(self.len_snippet):
            fno = start + self.alternate * i + 1
            frame, size = load_frame(join(path_clip, "%04d.png" % fno))
            clip.append(frame)
            if self.mode != "save":
                gt = load_map(
                    join(path_annt, "%04d.png" % fno),
                    size=(224, 384) if self.mode == "train" else None,
                )
                gts.append(gt)
        item = {"clip": np.stack(clip)}
        if self.mode == "save":
            item.update(start_idx=start, name=name, size=size)
        elif self.multi_frame:
            item["gt"] = np.stack(gts)
        else:
            item["gt"] = gts[-1]
        return item


class ChunkDataset:
    """DHF1K-layout contiguous-CHUNK sampler for streaming-consistent
    fine-tuning (training/streaming_ft.py): one random (train) / centered
    deterministic (val) run of `chunk_len` model-sized frames per video,
    with the GT map for EVERY chunk frame so any window's last-frame target
    is available. Videos shorter than chunk_len are skipped. No reference
    counterpart — the reference has no streaming training.

    Item: {"clip": (N,H,W,3) uint8, "gts": (N,224,384) f32}."""

    def __init__(self, path_data, chunk_len, mode="train"):
        self.path_data = path_data
        self.chunk_len = chunk_len
        self.mode = mode
        self.items = []
        for v in sorted(os.listdir(path_data)):
            n = len(os.listdir(join(path_data, v, "images")))
            if n >= chunk_len:
                self.items.append((v, n))
        assert self.items, f"no videos with >= {chunk_len} frames under {path_data}"

    def __len__(self):
        return len(self.items)

    def get(self, idx, rng: np.random.Generator):
        name, n = self.items[idx]
        if self.mode == "train":
            start = int(rng.integers(0, n - self.chunk_len + 1))
        else:
            start = (n - self.chunk_len) // 2
        clip, gts = [], []
        for i in range(self.chunk_len):
            fno = start + i + 1
            frame, _ = load_frame(join(self.path_data, name, "images", "%04d.png" % fno))
            clip.append(frame)
            gts.append(load_map(join(self.path_data, name, "maps", "%04d.png" % fno),
                                size=(224, 384)))
        return {"clip": np.stack(clip), "gts": np.stack(gts)}


class HollywoodUCFDataset:
    """Hollywood-2 / UCF-Sports layout (sorted file lists rather than fixed
    numbering); short videos left-padded by repeating the first frame
    (reference dataloader.py:310-391)."""

    def __init__(self, path_data, len_snippet, mode="train", multi_frame=0):
        self.path_data = path_data
        self.len_snippet = len_snippet
        self.mode = mode
        self.multi_frame = multi_frame
        if mode == "train":
            self.video_names = sorted(os.listdir(path_data))
            self.list_num_frame = [
                len(os.listdir(join(path_data, v, "images"))) for v in self.video_names
            ]
        else:
            self.list_num_frame = []
            for v in sorted(os.listdir(path_data)):
                n = len(os.listdir(join(path_data, v, "images")))
                for i in range(0, n - len_snippet, len_snippet):
                    self.list_num_frame.append((v, i))
                if n <= len_snippet:
                    self.list_num_frame.append((v, 0))

    def __len__(self):
        return len(self.list_num_frame)

    def get(self, idx, rng: np.random.Generator):
        if self.mode == "train":
            name = self.video_names[idx]
            start = int(rng.integers(0, max(1, self.list_num_frame[idx] - self.len_snippet + 1)))
        else:
            name, start = self.list_num_frame[idx]

        path_clip = join(self.path_data, name, "images")
        path_annt = join(self.path_data, name, "maps")
        frames = sorted(os.listdir(path_clip))
        sal = sorted(os.listdir(path_annt))
        if len(sal) < self.len_snippet:
            frames = [frames[0]] * (self.len_snippet - len(frames)) + frames
            sal = [sal[0]] * (self.len_snippet - len(sal)) + sal

        clip, gts = [], []
        for i in range(self.len_snippet):
            frame, _ = load_frame(join(path_clip, frames[start + i]))
            clip.append(frame)
            gts.append(load_map(
                join(path_annt, sal[start + i]),
                size=(224, 384) if self.mode == "train" else None,
            ))
        gt = np.stack(gts) if self.multi_frame else gts[-1]
        return {"clip": np.stack(clip), "gt": gt}


class SoundDataset:
    """The six audio-visual datasets (STAViS layout): fold lists under
    <root>/fold_lists/, frames under video_frames/<DS>/<video>/img_%05d.jpg,
    GT under annotations/<DS>/<video>/maps/eyeMap_%05d.jpg, audio under
    video_audio/<DS>/<video>/<video>.wav (reference dataloader.py:124-233).

    train: random window whose LAST frame has nonzero GT; test/val:
    windows strided 2*T with the same nonzero check.
    """

    def __init__(self, path_data, len_snippet, dataset_name="DIEM", split=1,
                 mode="train", use_sound=False):
        self.path_data = path_data
        self.len_snippet = len_snippet
        self.mode = mode
        self.dataset_name = dataset_name
        self.use_sound = use_sound

        if dataset_name == "DIEM":
            file_name = f"DIEM_list_{mode}_fps.txt"
        else:
            file_name = f"{dataset_name}_list_{mode}_{split}_fps.txt"
        fold = read_fold_list(join(path_data, "fold_lists", file_name))
        self.video_names = sorted(fold["names"])
        self.fps = dict(zip(fold["names"], fold["fps"]))

        self.list_num_frame = []
        if mode == "train":
            self.num_frames = [
                len(os.listdir(join(path_data, "annotations", dataset_name, v, "maps")))
                for v in self.video_names
            ]
        else:
            for v in self.video_names:
                frames = sorted(os.listdir(join(path_data, "annotations", dataset_name, v, "maps")))
                for i in range(0, len(frames) - len_snippet, 2 * len_snippet):
                    if self._has_gt(v, i + len_snippet):
                        self.list_num_frame.append((v, i))

        self.audio = {}
        if use_sound:
            nframes = {
                v: len(os.listdir(join(path_data, "annotations", dataset_name, v, "maps")))
                for v in self.video_names
            }
            self.audio = build_audio_index(
                self.video_names, nframes, self.fps,
                join(path_data, "video_audio", dataset_name),
            )

    def _has_gt(self, video, frame_no) -> bool:
        m = load_map(join(self.path_data, "annotations", self.dataset_name, video,
                          "maps", "eyeMap_%05d.jpg" % frame_no))
        return float(m.max()) != 0.0

    def __len__(self):
        return len(self.video_names) if self.mode == "train" else len(self.list_num_frame)

    def get(self, idx, rng: np.random.Generator):
        if self.mode == "train":
            name = self.video_names[idx]
            for _ in range(100):
                start = int(rng.integers(0, max(1, self.num_frames[idx] - self.len_snippet + 1)))
                if self._has_gt(name, start + self.len_snippet):
                    break
        else:
            name, start = self.list_num_frame[idx]

        path_clip = join(self.path_data, "video_frames", self.dataset_name, name)
        path_annt = join(self.path_data, "annotations", self.dataset_name, name, "maps")
        clip = []
        for i in range(self.len_snippet):
            frame, _ = load_frame(join(path_clip, "img_%05d.jpg" % (start + i + 1)))
            clip.append(frame)
        gt = load_map(join(path_annt, "eyeMap_%05d.jpg" % (start + self.len_snippet)),
                      size=(224, 384) if self.mode == "train" else None)
        item = {"clip": np.stack(clip), "gt": gt}
        if self.use_sound:
            item["audio"] = audio_excerpt(self.audio.get(name), self.len_snippet, start)
        return item


class ConcatDataset:
    """torch.utils.data.ConcatDataset equivalent for the 6-dataset AV mix
    (reference train.py:120-132)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def get(self, idx, rng):
        d = int(np.searchsorted(self.offsets, idx, side="right")) - 1
        return self.datasets[d].get(idx - int(self.offsets[d]), rng)
