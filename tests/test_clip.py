"""CLIP vision tower parity vs HF CLIPVisionModel (tiny random config), incl.
the exact hidden-state taps the SPI module consumes."""

import numpy as np
import pytest

import gpt4roi_tpu.models.clip_vit as cv
from gpt4roi_tpu.utils.weights import convert_clip_vision


@pytest.fixture(scope="module")
def tiny_pair():
    import torch
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel

    cfg = cv.ClipVisionConfig.tiny()
    hf_cfg = HFCfg(
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    params = convert_clip_vision(hf.state_dict(), cfg.num_layers)
    return cfg, hf, params


def test_hidden_states_parity(tiny_pair, rng):
    import torch

    cfg, hf, params = tiny_pair
    x = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3), dtype=np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x).permute(0, 3, 1, 2), output_hidden_states=True)
    last, hs = cv.clip_vision_forward(params, x, cfg)
    assert len(hs) == len(out.hidden_states) == cfg.num_layers + 1
    for i, (got, want) in enumerate(zip(hs, out.hidden_states)):
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3, err_msg=f"hidden state {i}"
        )
    np.testing.assert_allclose(np.asarray(last), out.last_hidden_state.numpy(), atol=2e-4, rtol=1e-3)


def test_feature_taps(tiny_pair, rng):
    """-2 select + [-2::-3] reversed last-4 tap pattern
    (gpt4roi/models/spi_llava.py:68-82) on a 24-layer shape check."""
    cfg, _, params = tiny_pair
    x = rng.standard_normal((1, cfg.image_size, cfg.image_size, 3), dtype=np.float32)
    _, hs = cv.clip_vision_forward(params, x, cfg)
    img, pyr = cv.select_image_and_pyramid_features(hs, -2, num_pyramid_levels=2)
    assert img.shape == (1, cfg.num_patches, cfg.hidden_size)
    assert len(pyr) == 2
    # for a 25-entry list (L=24): [-2::-3] -> [23,20,17,14,...]; tiny L=4 ->
    # hs indices [3, 0] -> reversed [0, 3]
    np.testing.assert_array_equal(np.asarray(pyr[1]), np.asarray(hs[3][:, 1:]))
    np.testing.assert_array_equal(np.asarray(pyr[0]), np.asarray(hs[0][:, 1:]))

    # and the documented ViT-L/14 pattern on a dummy 25-list
    dummy = [np.full((1, 2, 1), i) for i in range(25)]
    _, pyr = cv.select_image_and_pyramid_features(dummy, -2, num_pyramid_levels=4)
    assert [int(p[0, 0, 0]) for p in pyr] == [14, 17, 20, 23]
