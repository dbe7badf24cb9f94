"""Delta-weight make/apply roundtrip incl. vocab-mismatch rows and SPI skip
(reference: scripts/apply_delta.py:16-44)."""

import numpy as np

from gpt4roi_tpu.utils.delta import apply_delta, make_delta


def test_roundtrip(rng):
    base = {
        "llama": {"embed": {"embedding": rng.standard_normal((10, 4), dtype=np.float32)},
                  "layers": [{"q": {"kernel": rng.standard_normal((4, 4), dtype=np.float32)}}]},
        "spi": {"updims": {"kernel": rng.standard_normal((4, 8), dtype=np.float32)}},
    }
    target = {
        "llama": {"embed": {"embedding": rng.standard_normal((12, 4), dtype=np.float32)},  # bigger vocab
                  "layers": [{"q": {"kernel": rng.standard_normal((4, 4), dtype=np.float32)}}]},
        "spi": {"updims": {"kernel": rng.standard_normal((4, 8), dtype=np.float32)}},
    }
    delta = make_delta(base, target)
    # spi ships as-is in the delta
    np.testing.assert_array_equal(delta["spi"]["updims"]["kernel"], target["spi"]["updims"]["kernel"])
    recovered = apply_delta(base, delta)
    np.testing.assert_allclose(
        recovered["llama"]["layers"][0]["q"]["kernel"],
        target["llama"]["layers"][0]["q"]["kernel"], atol=1e-6,
    )
    np.testing.assert_allclose(
        recovered["llama"]["embed"]["embedding"], target["llama"]["embed"]["embedding"], atol=1e-6
    )
    np.testing.assert_array_equal(recovered["spi"]["updims"]["kernel"], target["spi"]["updims"]["kernel"])


def test_chat_prompt_rewrite():
    from gpt4roi_tpu.serve.chat import REGION_PAT, ChatSession

    class DummyEngine:
        class ecfg:
            max_seq_len = 2048

        cfg = None

    s = ChatSession.__new__(ChatSession)
    assert (
        ChatSession.rewrite_prompt(s, "what is <region1> next to <region2>?")
        == "what is region1 <bbox> next to region2 <bbox>?"
    )
    # validation: referring to undrawn region
    s.boxes = [[0.1, 0.1, 0.5, 0.5]]
    s.first_turn = True
    err = ChatSession.check_input(s, "tell me about <region3>", 0)
    assert err is not None and "region3" in err
    assert ChatSession.check_input(s, "tell me about <region1>", 0) is None
