"""Audio indexing and per-window excerpt extraction.

Capability parity with the reference's make_dataset/get_audio_feature
(/root/reference/dataloader.py:36-122): per-video, the whole wav is loaded
RAM-resident at raw integer scale * 2^-23, per-frame sample ranges are
precomputed from fps, and a clip's excerpt is Hanning-windowed and
center-padded into a fixed 70560-sample buffer
(= 22050 Hz / 10 fps * 32 frames), giving SoundNet a static shape.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

MAX_AUDIO_FS = 22050
MIN_VIDEO_FPS = 10
MAX_AUDIO_WIN = int(MAX_AUDIO_FS / MIN_VIDEO_FPS * 32)  # 70560


def load_wav_raw(path: str) -> tuple[np.ndarray, int]:
    """Load a wav at raw integer amplitude scaled by 2^-23 (the reference's
    torchaudio.load(normalization=False) * 2**-23, dataloader.py:62-63).
    Returns (samples (C, N) float32, sample_rate)."""
    from scipy.io import wavfile

    fs, data = wavfile.read(path)
    data = np.atleast_2d(np.asarray(data))
    if data.shape[0] > data.shape[1]:
        data = data.T  # (C, N)
    return data.astype(np.float32) * (2.0**-23), fs


@dataclass
class AudioInfo:
    wav: np.ndarray  # (C, N) float32
    fs: int
    starts: np.ndarray  # (n_frames+1,) int
    ends: np.ndarray


def frame_sample_ranges(n_samples_total: int, n_frames: int, fs: float, fps: float):
    """Per-frame [start, end) sample ranges centered on frame timestamps at
    fs/fps samples per frame (dataloader.py:65-74). Index 0 is a sentinel."""
    spf = fs / float(fps)
    starts = np.zeros(n_frames + 1, dtype=np.int64)
    ends = np.zeros(n_frames + 1, dtype=np.int64)
    for f in range(1, n_frames + 1):
        t = (f - 1) * (1.0 / float(fps)) * fs
        starts[f] = int(max(0.0, t - spf / 2))
        ends[f] = int(min(n_samples_total, abs(t + spf / 2)))
    return starts, ends


def build_audio_index(video_names, nframes_by_video, fps_by_video, audio_root, *, gt_root=None):
    """audio index: video name -> AudioInfo. Mirrors make_dataset
    (dataloader.py:36-87): counts GT frames if gt_root given, skips missing
    wavs."""
    index = {}
    for name in video_names:
        wav_path = os.path.join(audio_root, name, f"{name}.wav")
        if not os.path.exists(wav_path):
            continue
        n_frames = nframes_by_video[name]
        if gt_root is not None:
            maps_dir = os.path.join(gt_root, name, "maps")
            if os.path.isdir(maps_dir):
                n_frames = len(os.listdir(maps_dir))
        if n_frames <= 1:
            continue
        wav, fs = load_wav_raw(wav_path)
        starts, ends = frame_sample_ranges(wav.shape[1], n_frames, fs, fps_by_video[name])
        index[name] = AudioInfo(wav=wav, fs=fs, starts=starts, ends=ends)
    return index


def audio_excerpt(info: AudioInfo | None, clip_size: int, start_idx: int) -> np.ndarray:
    """Extract the Hanning-windowed, center-padded excerpt for frames
    [start_idx+1, start_idx+clip_size]. Returns (MAX_AUDIO_WIN, 1) float32.
    Missing audio -> zeros (the reference prints and returns zeros,
    dataloader.py:119-120)."""
    buf = np.zeros((MAX_AUDIO_WIN,), np.float32)
    if info is not None:
        s = int(info.starts[start_idx + 1])
        if start_idx + clip_size >= len(info.ends):
            e = int(info.ends[-1])
        else:
            e = int(info.ends[start_idx + clip_size])
        excerpt = info.wav[0, s : e + 1]
        n = excerpt.shape[0]
        if n > 0:
            n = min(n, MAX_AUDIO_WIN)
            excerpt = excerpt[:n] * np.hanning(excerpt.shape[0])[:n].astype(np.float32)
            c = MAX_AUDIO_WIN // 2
            lo = c - n // 2
            buf[lo : lo + n] = excerpt
    return buf[:, None]
