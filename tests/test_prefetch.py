"""PrefetchLoader: order-preserving, error-propagating background prefetch."""

import pytest

from gpt4roi_tpu.data.module import PrefetchLoader


class FakeLoader:
    def __init__(self, n, fail_at=None):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            if self.fail_at == i:
                raise ValueError("boom")
            yield {"i": i}


def test_order_preserved():
    out = [b["i"] for b in PrefetchLoader(FakeLoader(10), depth=3)]
    assert out == list(range(10))


def test_error_propagates():
    with pytest.raises(ValueError, match="boom"):
        list(PrefetchLoader(FakeLoader(10, fail_at=4), depth=2))


def test_delta_cli_roundtrip(tmp_path):
    import numpy as np

    from gpt4roi_tpu.train.checkpoints import save_params_npz
    from scripts.delta_weights import _load_flat, _unflatten

    params = {"llama": {"layers": [{"q": {"kernel": np.ones((2, 2), np.float32)}}]},
              "spi": {"updims": {"kernel": np.zeros((2, 3), np.float32)}}}
    path = str(tmp_path / "p.npz")
    save_params_npz(path, params)
    back = _unflatten(_load_flat(path))
    np.testing.assert_array_equal(back["llama"]["layers"][0]["q"]["kernel"], np.ones((2, 2)))
    assert isinstance(back["llama"]["layers"], list)
