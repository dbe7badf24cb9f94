"""Ragged batched serving: generate_ragged over different-length prompts
matches per-sample unbatched generation exactly (greedy)."""

import numpy as np
import pytest

import jax

from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
from tests.test_gpt4roi import make_batch


def test_ragged_matches_unbatched(rng):
    from gpt4roi_tpu.serve.engine import Engine, EngineConfig

    cfg = Gpt4RoiConfig.tiny()
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    eng = Engine(params, cfg, EngineConfig(max_seq_len=96, prefill_bucket=32))

    ids1, img1, boxes1, mask1 = make_batch(cfg, rng, b=1, s=24)
    ids2, img2, boxes2, mask2 = make_batch(cfg, rng, b=1, s=28)

    want1 = eng.generate(ids1, img1, boxes1, mask1, max_new_tokens=4, temperature=0.0)[0]
    want2 = eng.generate(ids2, img2, boxes2, mask2, max_new_tokens=4, temperature=0.0)[0]

    prompts = [list(ids1[0]), list(ids2[0])]
    images = np.concatenate([img1, img2], axis=0)
    boxes = np.concatenate([boxes1, boxes2], axis=0)
    mask = np.concatenate([mask1, mask2], axis=0)
    got = eng.generate_ragged(prompts, images, boxes, mask, max_new_tokens=4, temperature=0.0)
    assert got[0] == want1
    assert got[1] == want2
