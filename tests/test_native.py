"""Native C++ data-path parity vs the numpy/torch reference path."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gpt4roi_tpu.data import native
from gpt4roi_tpu.data.constants import CLIP_MEAN, CLIP_STD


pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def test_resize_normalize_matches_torch(rng):
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    got = native.resize_normalize(img, (224, 224))
    xt = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None]
    want = F.interpolate(xt, size=(224, 224), mode="bilinear", align_corners=False)
    want = want[0].permute(1, 2, 0).numpy()
    mean = np.array(CLIP_MEAN, np.float32) * 255
    std = np.array(CLIP_STD, np.float32) * 255
    want = (want - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_collate_pad(rng):
    rows = [np.arange(5, dtype=np.int32), np.arange(3, dtype=np.int32), np.arange(12, dtype=np.int32)]
    out, mask = native.collate_pad(rows, seq_len=8, pad_value=-7)
    assert out.shape == (3, 8)
    np.testing.assert_array_equal(out[0], [0, 1, 2, 3, 4, -7, -7, -7])
    np.testing.assert_array_equal(out[2], np.arange(8))  # truncated
    np.testing.assert_array_equal(mask[1], [1, 1, 1, 0, 0, 0, 0, 0])


def test_version():
    lib = native.load_library()
    assert lib.datapath_version() == 1
