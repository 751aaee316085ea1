"""On-device augmentation (data/device_aug.py): the device path
(uint8 frames + int16 audio + draw params shipped, math jitted on the
accelerator) must produce the same batches as the host-side vectorized
path (data/images.apply_av_batch) for the same (seed, epoch, batch,
idx) draws — it is the production ingest fast path at chip-rate."""

import os
import tempfile

import numpy as np
import pytest

from triad_tpu.data.datasets import SyntheticAVDataset
from triad_tpu.data.packed import PackedAVDataset, pack_dataset
from triad_tpu.data.pipeline import AVLoader


@pytest.fixture(scope="module")
def pack_path():
    tmp = tempfile.mkdtemp(prefix="triad_test_devaug_")
    path = os.path.join(tmp, "t.tpack")
    src = SyntheticAVDataset(size=12, image_size=32, audio_seconds=0.5)
    pack_dataset(src, path, image_size=32, audio_samples=8000)
    yield path
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def _loader(pack_path, device_augment):
    return AVLoader(
        PackedAVDataset(pack_path), batch_size=4, audio_num_samples=8000,
        num_workers=0, seed=7, device_augment=device_augment,
    )


def test_device_batch_carries_wire_dtypes(pack_path):
    batch = next(iter(_loader(pack_path, True)))
    assert batch["frames_u8"].dtype == np.uint8
    assert batch["audio_i16"].dtype == np.int16
    assert batch["frames_u8"].shape == (4, 32, 32, 3)
    assert batch["audio_i16"].shape == (4, 8000)
    for k in ("aug_flip", "aug_brightness", "aug_contrast", "aug_saturation"):
        assert k in batch


def test_device_ingest_matches_host_augmentation(pack_path):
    from triad_tpu.data.device_aug import device_ingest_av

    host = next(iter(_loader(pack_path, False)))
    dev = device_ingest_av(next(iter(_loader(pack_path, True))))
    np.testing.assert_allclose(
        np.asarray(dev["images"]), host["images"], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(dev["audio"]), host["audio"], rtol=1e-6, atol=1e-7
    )
    assert dev["video_paths"] == host["video_paths"]


def test_ingest_passthrough_for_augmented_batches(pack_path):
    from triad_tpu.data.device_aug import device_ingest_av

    host = next(iter(_loader(pack_path, False)))
    out = device_ingest_av(host)
    np.testing.assert_allclose(
        np.asarray(out["images"]), host["images"], rtol=0, atol=0
    )
