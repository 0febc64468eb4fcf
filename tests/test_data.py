"""Dataset sampling semantics + loader pipeline on synthetic fixtures."""

import numpy as np
import pytest

from tests.fixtures import make_dhf1k, make_sound_dataset
from vinet_tpu.data import DHF1KDataset, HollywoodUCFDataset, Loader, SoundDataset, device_preprocess
from vinet_tpu.data.audio import MAX_AUDIO_WIN, audio_excerpt, frame_sample_ranges
from vinet_tpu.data.datasets import ConcatDataset


@pytest.fixture(scope="module")
def dhf1k_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dhf1k")
    return str(make_dhf1k(root, n_videos=2, n_frames=70))


@pytest.fixture(scope="module")
def sound_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("stavis")
    r, names = make_sound_dataset(root, n_videos=1, n_frames=40)
    return str(r)


def test_dhf1k_train_item(dhf1k_root):
    ds = DHF1KDataset(dhf1k_root, 8, mode="train")
    assert len(ds) == 2
    item = ds.get(0, np.random.default_rng(0))
    assert item["clip"].shape == (8, 224, 384, 3) and item["clip"].dtype == np.uint8
    assert item["gt"].shape == (224, 384)
    assert 0.0 < item["gt"].max() <= 1.0


def test_dhf1k_val_windows(dhf1k_root):
    ds = DHF1KDataset(dhf1k_root, 8, mode="val")
    # 70 frames, stride 4*8=32, range(0, 70-8) -> starts 0, 32; x2 videos
    assert len(ds) == 4
    item = ds.get(0, np.random.default_rng(0))
    assert item["gt"].shape == (64, 96)  # native GT size in val


def test_dhf1k_save_windows(dhf1k_root):
    ds = DHF1KDataset(dhf1k_root, 8, mode="save")
    # starts 0,8,...,56 (8) plus tail 62 -> 9 per video
    assert len(ds) == 18
    item = ds.get(0, np.random.default_rng(0))
    assert item["name"] == "001" and "gt" not in item
    assert item["size"] == (96, 64)  # PIL (W, H)


def test_dhf1k_multi_frame_gt(dhf1k_root):
    ds = DHF1KDataset(dhf1k_root, 8, mode="train", multi_frame=1)
    item = ds.get(0, np.random.default_rng(0))
    assert item["gt"].shape == (8, 224, 384)


def test_hollywood_pads_short_videos(tmp_path):
    root = make_dhf1k(tmp_path / "holly", n_videos=1, n_frames=5)
    ds = HollywoodUCFDataset(str(root), 8, mode="val")
    assert len(ds) == 1
    item = ds.get(0, np.random.default_rng(0))
    assert item["clip"].shape == (8, 224, 384, 3)
    # left-padded by repeating first frame
    np.testing.assert_array_equal(item["clip"][0], item["clip"][1])


def test_sound_dataset(sound_root):
    ds = SoundDataset(sound_root, 8, dataset_name="DIEM", mode="train", use_sound=True)
    assert len(ds) == 1
    item = ds.get(0, np.random.default_rng(0))
    assert item["clip"].shape == (8, 224, 384, 3)
    assert item["gt"].shape == (224, 384)
    assert item["audio"].shape == (MAX_AUDIO_WIN, 1)
    assert np.abs(item["audio"]).max() > 0  # real excerpt, not all-zero padding

    ds_test = SoundDataset(sound_root, 8, dataset_name="DIEM", mode="test", use_sound=False)
    # 40 frames, stride 16: starts 0, 16
    assert len(ds_test) == 2


def test_concat_dataset(sound_root):
    a = SoundDataset(sound_root, 8, dataset_name="DIEM", mode="test")
    c = ConcatDataset([a, a])
    assert len(c) == 2 * len(a)
    i0 = c.get(0, np.random.default_rng(0))
    i2 = c.get(len(a), np.random.default_rng(0))
    np.testing.assert_array_equal(i0["clip"], i2["clip"])


def test_audio_excerpt_centering():
    from vinet_tpu.data.audio import AudioInfo

    fs, fps, nf = 22050, 10.0, 40
    n = int(fs * nf / fps)
    wav = np.ones((1, n), np.float32)
    starts, ends = frame_sample_ranges(n, nf, fs, fps)
    info = AudioInfo(wav=wav, fs=fs, starts=starts, ends=ends)
    exc = audio_excerpt(info, 32, 0)
    assert exc.shape == (MAX_AUDIO_WIN, 1)
    c = MAX_AUDIO_WIN // 2
    assert exc[c] > 0  # centered
    # 32 frames at 10 fps = full 70560 window
    assert (exc != 0).sum() > 0.9 * MAX_AUDIO_WIN
    # Hanning envelope: edges of the excerpt taper to ~0
    assert exc[c] > exc[1000]


def test_audio_excerpt_missing_video():
    exc = audio_excerpt(None, 32, 0)
    assert exc.shape == (MAX_AUDIO_WIN, 1) and not exc.any()


def test_loader_batching_and_determinism(dhf1k_root):
    ds = DHF1KDataset(dhf1k_root, 8, mode="train")
    l1 = Loader(ds, batch_size=2, shuffle=True, num_workers=2, seed=7, drop_last=False)
    b1 = list(l1)
    assert len(b1) == 1 and b1[0]["clip"].shape == (2, 8, 224, 384, 3)
    l2 = Loader(ds, batch_size=2, shuffle=True, num_workers=2, seed=7, drop_last=False)
    b2 = list(l2)
    np.testing.assert_array_equal(b1[0]["clip"], b2[0]["clip"])


def test_loader_host_sharding(dhf1k_root):
    ds = DHF1KDataset(dhf1k_root, 8, mode="save")
    full = Loader(ds, batch_size=1, shard=(0, 1), drop_last=False)
    s0 = Loader(ds, batch_size=1, shard=(0, 2), drop_last=False)
    s1 = Loader(ds, batch_size=1, shard=(1, 2), drop_last=False)
    assert len(s0) + len(s1) == len(full) == 18


def test_device_preprocess():
    import jax.numpy as jnp

    u8 = np.full((1, 2, 4, 4, 3), 128, np.uint8)
    x = device_preprocess(jnp.asarray(u8))
    expect = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(x)[0, 0, 0, 0], expect, rtol=1e-5)
