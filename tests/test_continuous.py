"""Continuous (slot-based) batching: exact parity with one-shot generation,
mid-decode admission within one chunk, and multi-round sessions sharing one
decode batch with prefix caches (VERDICT r2 items 3 and 6)."""

import numpy as np
import pytest

import jax

from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
from tests.test_gpt4roi import make_batch


@pytest.fixture(scope="module")
def tiny_engine():
    from gpt4roi_tpu.serve.engine import Engine, EngineConfig

    cfg = Gpt4RoiConfig.tiny()
    params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    return Engine(params, cfg, EngineConfig(max_seq_len=96, prefill_bucket=32)), cfg


def test_continuous_matches_oneshot(tiny_engine, rng):
    """Three staggered one-shot requests decode in one shared batch and
    reproduce per-request Engine.generate greedy outputs exactly."""
    from gpt4roi_tpu.serve.continuous import ContinuousEngine

    eng, cfg = tiny_engine
    ce = ContinuousEngine(eng, n_slots=4, chunk_size=4)

    reqs = [make_batch(cfg, rng, b=1, s=s) for s in (20, 24, 28)]
    wants = [
        eng.generate(ids, img, bx, m, max_new_tokens=6, temperature=0.0, chunk_size=4)[0]
        for ids, img, bx, m in reqs
    ]
    handles = [
        ce.submit(list(ids[0]), img, bx, m, max_new_tokens=6, temperature=0.0)
        for ids, img, bx, m in reqs
    ]
    ce.run_until_idle()
    for h, want in zip(handles, wants):
        assert h.result() == want


def test_mid_decode_admission(tiny_engine, rng):
    """A request arriving mid-decode is admitted at the next chunk boundary
    — its first token arrives after ONE step() call."""
    from gpt4roi_tpu.serve.continuous import ContinuousEngine

    eng, cfg = tiny_engine
    ce = ContinuousEngine(eng, n_slots=4, chunk_size=4)

    ids, img, bx, m = make_batch(cfg, rng, b=1, s=20)
    a = ce.submit(list(ids[0]), img, bx, m, max_new_tokens=40, temperature=0.0)
    ce.step()
    ce.step()
    assert not a.done.is_set()  # A is mid-decode

    ids2, img2, bx2, m2 = make_batch(cfg, rng, b=1, s=24)
    b = ce.submit(list(ids2[0]), img2, bx2, m2, max_new_tokens=6, temperature=0.0)
    assert b.drain_new() == []
    ce.step()  # admission + one chunk
    first = b.drain_new()
    assert len(first) >= 1, "B must start decoding within one chunk"
    ce.run_until_idle()
    # B joined mid-flight, but still matches its solo generation exactly
    want_b = eng.generate(ids2, img2, bx2, m2, max_new_tokens=6, temperature=0.0, chunk_size=4)[0]
    assert b.result() == want_b
    assert a.done.is_set() and len(a.tokens) == 40


def test_sessions_share_batch_match_sequential(tiny_engine, rng):
    """Two multi-round sessions decode concurrently in one batch (each with
    its prefix cache parked in the shared slots) and reproduce sequential
    CachedSession outputs exactly."""
    from gpt4roi_tpu.serve.continuous import ContinuousEngine

    eng, cfg = tiny_engine
    n_img = cfg.num_image_tokens

    def make_round1(s):
        ids, img, bx, m = make_batch(cfg, rng, b=1, s=s)
        return list(ids[0]), img, bx, m

    def make_round2():
        return [int(t) for t in rng.integers(5, 50, (8,))]

    r1a, imga, bxa, ma = make_round1(22)
    r1b, imgb, bxb, mb = make_round1(26)
    r2a, r2b = make_round2(), make_round2()

    # sequential reference: one CachedSession per conversation
    wants = []
    for r1, r2, img, bx, m in ((r1a, r2a, imga, bxa, ma), (r1b, r2b, imgb, bxb, mb)):
        cs = eng.cached_session()
        cs.set_vision(img, bx, m)
        o1 = cs.append_and_generate(r1, max_new_tokens=5, temperature=0.0, chunk_size=4)
        o2 = cs.append_and_generate(r2, max_new_tokens=5, temperature=0.0, chunk_size=4)
        wants.append((o1, o2))

    ce = ContinuousEngine(eng, n_slots=4, chunk_size=4)
    sa, sb = ce.session(), ce.session()
    sa.set_vision(imga, bxa, ma)
    sb.set_vision(imgb, bxb, mb)
    ha1 = sa.ask(r1a, max_new_tokens=5, temperature=0.0)
    hb1 = sb.ask(r1b, max_new_tokens=5, temperature=0.0)
    ce.run_until_idle()
    # both sessions were in flight together
    ha2 = sa.ask(r2a, max_new_tokens=5, temperature=0.0)
    hb2 = sb.ask(r2b, max_new_tokens=5, temperature=0.0)
    ce.run_until_idle()

    assert (ha1.result(), ha2.result()) == wants[0]
    assert (hb1.result(), hb2.result()) == wants[1]
    sa.close()
    sb.close()
    # closed sessions release their slots
    assert not ce.reserved.any()


@pytest.mark.slow
def test_churn_stress_slot_reuse_and_parity(tiny_engine, rng):
    """Randomized churn (VERDICT r3 item 9): staggered arrivals with varying
    max_new_tokens, mid-flight cancellations, and interleaved multi-round
    session parks over few slots — every surviving request must match its
    isolated greedy run exactly, cancelled requests must be a prefix of
    theirs, every slot must cycle through admit/evict >= 3 times, and no
    slot may leak (all free at the end)."""
    from gpt4roi_tpu.serve.continuous import ContinuousEngine

    eng, cfg = tiny_engine
    ce = ContinuousEngine(eng, n_slots=3, chunk_size=4)

    admits = np.zeros((ce.n,), np.int64)
    evicts = np.zeros((ce.n,), np.int64)
    orig_admit, orig_evict = ce._admit, ce._evict

    def counting_admit(job, slot):
        admits[slot] += 1
        orig_admit(job, slot)

    def counting_evict(slot):
        evicts[slot] += 1
        orig_evict(slot)

    ce._admit = counting_admit
    ce._evict = counting_evict

    # 9 one-shot requests: varying prompt length + budget; 3 get cancelled
    reqs = []
    for i in range(9):
        s = int(rng.integers(18, 30))
        n_new = int(rng.integers(3, 12))
        reqs.append((make_batch(cfg, rng, b=1, s=s), n_new, i % 3 == 2))
    wants = [
        eng.generate(ids, img, bx, m, max_new_tokens=n_new, temperature=0.0, chunk_size=4)[0]
        for (ids, img, bx, m), n_new, _ in reqs
    ]

    # 2 sessions x 2 rounds interleaved with the one-shots (park cycles)
    r1a = make_batch(cfg, rng, b=1, s=22)
    r1b = make_batch(cfg, rng, b=1, s=26)
    r2a = [int(t) for t in rng.integers(5, 50, (7,))]
    r2b = [int(t) for t in rng.integers(5, 50, (6,))]
    sess_wants = []
    for (ids, img, bx, m), r2 in ((r1a, r2a), (r1b, r2b)):
        cs = eng.cached_session()
        cs.set_vision(img, bx, m)
        o1 = cs.append_and_generate(list(ids[0]), max_new_tokens=4, temperature=0.0, chunk_size=4)
        o2 = cs.append_and_generate(r2, max_new_tokens=4, temperature=0.0, chunk_size=4)
        sess_wants.append((o1, o2))

    sa, sb = ce.session(), ce.session()
    sa.set_vision(*r1a[1:])
    sb.set_vision(*r1b[1:])

    # scripted schedule: (step index, action)
    handles = [None] * len(reqs)
    sess_handles = {}
    schedule = {
        0: lambda: handles.__setitem__(0, _submit(ce, reqs[0])),
        1: lambda: (
            handles.__setitem__(1, _submit(ce, reqs[1])),
            sess_handles.__setitem__("a1", sa.ask(list(r1a[0][0]), max_new_tokens=4)),
        ),
        2: lambda: handles.__setitem__(2, _submit(ce, reqs[2])),
        3: lambda: handles.__setitem__(3, _submit(ce, reqs[3])),
        4: lambda: (
            handles.__setitem__(4, _submit(ce, reqs[4])),
            sess_handles.__setitem__("b1", sb.ask(list(r1b[0][0]), max_new_tokens=4)),
        ),
        6: lambda: handles.__setitem__(5, _submit(ce, reqs[5])),
        8: lambda: (
            handles.__setitem__(6, _submit(ce, reqs[6])),
            sess_handles.__setitem__("a2", sa.ask(r2a, max_new_tokens=4)),
        ),
        10: lambda: handles.__setitem__(7, _submit(ce, reqs[7])),
        12: lambda: (
            handles.__setitem__(8, _submit(ce, reqs[8])),
            sess_handles.__setitem__("b2", sb.ask(r2b, max_new_tokens=4)),
        ),
    }
    for step_i in range(300):
        if step_i in schedule:
            schedule[step_i]()
        # cancel marked requests once their first token has landed
        for h, ((_, _, _, _), _, cancel) in zip(handles, reqs):
            if h is not None and cancel and h.tokens and not h.cancelled:
                h.cancel()
        ce.step()
        all_submitted = all(h is not None for h in handles) and len(sess_handles) == 4
        if all_submitted and all(h.done.is_set() for h in handles) and all(
            h.done.is_set() for h in sess_handles.values()
        ):
            break
    else:
        raise AssertionError("churn scenario did not converge")

    for h, want, (_, _, cancel) in zip(handles, wants, [(r, n, c) for r, n, c in reqs]):
        got = h.result()
        if cancel:
            assert got == want[: len(got)], "cancelled request must be a prefix"
            assert len(got) <= len(want)
        else:
            assert got == want
    assert sess_handles["a1"].result() == sess_wants[0][0]
    assert sess_handles["a2"].result() == sess_wants[0][1]
    assert sess_handles["b1"].result() == sess_wants[1][0]
    assert sess_handles["b2"].result() == sess_wants[1][1]

    sa.close()
    sb.close()
    # no leaked slots: nothing active, nothing reserved, no handles
    assert not ce.active.any()
    assert not ce.reserved.any()
    assert all(h is None for h in ce.handles)
    assert int((ce.buf_pos == ce.S).sum()) == ce.n  # all parked at S
    # every slot cycled >= 3 admit/evict/park rounds (13 admissions over 3
    # slots; parked-session slots trade admits for park cycles)
    assert admits.sum() == len(reqs) + 4
    assert evicts.sum() == admits.sum()
    cycles = admits + evicts
    assert (cycles >= 3).all(), f"slot cycle counts {cycles}"


def _submit(ce, req):
    (ids, img, bx, m), n_new, _ = req
    return ce.submit(list(ids[0]), img, bx, m, max_new_tokens=n_new, temperature=0.0)


def test_chunked_prefill_interleaves_with_decode(tiny_engine, rng):
    """A long prompt admitted with ``prefill_chunk`` set is prefilled one
    fragment per step while the running request KEEPS decoding between
    fragments; the chunked request still reproduces its solo greedy output
    exactly (beyond reference — the reference worker serializes whole
    requests, llava/serve/model_worker.py:168-260)."""
    from gpt4roi_tpu.serve.continuous import ContinuousEngine

    eng, cfg = tiny_engine
    ce = ContinuousEngine(eng, n_slots=4, chunk_size=4, prefill_chunk=24)

    # A: short prompt (<= prefill_chunk -> monolithic admission), long
    # generation — the victim that must not stall
    ids, img, bx, m = make_batch(cfg, rng, b=1, s=20)
    a = ce.submit(list(ids[0]), img, bx, m, max_new_tokens=30, temperature=0.0)
    ce.step()
    n_a0 = len(a.tokens)
    assert n_a0 >= 1

    # B: long prompt (> prefill_chunk) -> chunked admission over 4 steps
    ids2, img2, bx2, m2 = make_batch(cfg, rng, b=1, s=60)
    want_b = eng.generate(ids2, img2, bx2, m2, max_new_tokens=6, temperature=0.0, chunk_size=4)[0]
    b = ce.submit(list(ids2[0]), img2, bx2, m2, max_new_tokens=6, temperature=0.0)

    import math
    n_frags = math.ceil(60 / 24)
    for i in range(n_frags):
        n_a_before = len(a.tokens)
        ce.step()
        # decode keeps flowing for A during every prefill fragment
        assert len(a.tokens) > n_a_before, f"A stalled during fragment {i}"
        if i < n_frags - 1:
            assert not b.tokens, "B must not emit before its prompt completes"
    assert len(b.tokens) >= 1, "B activates on its final fragment"

    ce.run_until_idle()
    assert b.result() == want_b
    want_a = eng.generate(ids, img, bx, m, max_new_tokens=30, temperature=0.0, chunk_size=4)[0]
    assert a.result() == want_a
    assert not ce.active.any() and not ce.reserved.any()
    assert all(p is None for p in ce.prefilling)


def test_chunked_prefill_cancel_frees_slot(tiny_engine, rng):
    """Cancelling a request mid-chunked-prefill frees its slot without
    activating it."""
    from gpt4roi_tpu.serve.continuous import ContinuousEngine

    eng, cfg = tiny_engine
    ce = ContinuousEngine(eng, n_slots=2, chunk_size=4, prefill_chunk=16)
    ids, img, bx, m = make_batch(cfg, rng, b=1, s=60)
    h = ce.submit(list(ids[0]), img, bx, m, max_new_tokens=6, temperature=0.0)
    ce.step()  # admits + first fragment
    assert any(p is not None for p in ce.prefilling)
    h.cancel()
    ce.step()
    assert all(p is None for p in ce.prefilling)
    assert not ce.reserved.any() and not ce.active.any()
    assert h.done.is_set() and h.tokens == []
