from vinet_tpu.data.datasets import (
    ChunkDataset,
    DHF1KDataset,
    HollywoodUCFDataset,
    SoundDataset,
    AV_DATASETS,
)
from vinet_tpu.data.pipeline import Loader, device_preprocess
from vinet_tpu.data.audio import build_audio_index, audio_excerpt, MAX_AUDIO_WIN

__all__ = [
    "ChunkDataset",
    "DHF1KDataset",
    "HollywoodUCFDataset",
    "SoundDataset",
    "AV_DATASETS",
    "Loader",
    "device_preprocess",
    "build_audio_index",
    "audio_excerpt",
    "MAX_AUDIO_WIN",
]
