"""Box-sketch UI logic, headless (VERDICT r1 item 6; reference:
gpt4roi/app.py:365-388 ImageSketcher + check_input/visualize 191-240,330-363):
stroke-layer/mask -> box extraction, multi-round accumulation, validation,
and the indexed overlay."""

import numpy as np

from gpt4roi_tpu.serve.app import extract_sketch_boxes
from gpt4roi_tpu.serve.sketch import (
    SketchRounds,
    layer_to_box,
    layers_to_boxes,
    mask_to_boxes,
)


def rect_layer(h, w, y1, x1, y2, x2, rgba=True, outline=False):
    m = np.zeros((h, w), np.uint8)
    if outline:  # user draws a box outline, not a filled blob
        m[y1, x1:x2] = 255
        m[y2 - 1, x1:x2] = 255
        m[y1:y2, x1] = 255
        m[y1:y2, x2 - 1] = 255
    else:
        m[y1:y2, x1:x2] = 255
    if rgba:
        out = np.zeros((h, w, 4), np.uint8)
        out[..., 3] = m
        return out
    return m


def test_layer_to_box_alpha_and_gray():
    l = rect_layer(48, 64, 4, 8, 20, 30)
    assert layer_to_box(l) == (8.0, 4.0, 30.0, 20.0)
    assert layer_to_box(l[..., 3]) == (8.0, 4.0, 30.0, 20.0)
    assert layer_to_box(np.zeros((8, 8), np.uint8)) is None


def test_outline_stroke_gives_full_extent():
    # drawing the box as an outline must produce the same extent as a fill
    l = rect_layer(48, 64, 4, 8, 20, 30, outline=True)
    assert layer_to_box(l) == (8.0, 4.0, 30.0, 20.0)


def test_layers_to_boxes_preserves_draw_order():
    l1 = rect_layer(48, 64, 30, 40, 44, 60)  # drawn first, lower-right
    l2 = rect_layer(48, 64, 2, 2, 10, 12)  # drawn second, upper-left
    boxes = layers_to_boxes([l1, l2])
    assert boxes == [(40.0, 30.0, 60.0, 44.0), (2.0, 2.0, 12.0, 10.0)]


def test_mask_to_boxes_connected_components():
    m = np.zeros((60, 80), np.uint8)
    m[5:15, 10:30] = 1  # blob A
    m[40:55, 50:70] = 1  # blob B
    m[0:2, 0:2] = 1  # tiny speck below min_area
    boxes = mask_to_boxes(m, min_area=16)
    assert boxes == [(10.0, 5.0, 30.0, 15.0), (50.0, 40.0, 70.0, 55.0)]


def test_mask_to_boxes_diagonal_connectivity():
    m = np.zeros((20, 20), np.uint8)
    for i in range(10):  # a diagonal stroke: one component under 8-conn
        m[i, i] = 1
        m[i, i + 1] = 1
        m[i + 1, i] = 1
    assert len(mask_to_boxes(m, min_area=4)) == 1


def test_extract_sketch_boxes_layers_then_composite():
    bg = np.full((48, 64, 3), 200, np.uint8)
    l1 = rect_layer(48, 64, 4, 8, 20, 30)
    # layers present -> per-layer extraction
    v = {"background": bg, "layers": [l1], "composite": None}
    assert extract_sketch_boxes(v) == [(8.0, 4.0, 30.0, 20.0)]
    # no layers -> composite minus background
    comp = bg.copy()
    comp[10:20, 40:60] = (255, 0, 0)
    v = {"background": bg, "layers": [], "composite": comp}
    assert extract_sketch_boxes(v) == [(40.0, 10.0, 60.0, 20.0)]


def test_sketch_rounds_accumulation_and_validation():
    r = SketchRounds()
    b1 = (8.0, 4.0, 30.0, 20.0)
    b2 = (40.0, 30.0, 60.0, 44.0)

    # round 1: no boxes drawn -> error (app.py:199-201)
    assert "drawing boxes" in r.validate("hi", [])
    # one box, one region -> ok, new_boxes = [b1]
    assert r.validate("what is <region1> ?", [b1]) is None
    assert r.new_boxes([b1]) == [b1]
    r.commit([b1])

    # round 2: re-reference region1 without drawing -> ok, no new boxes
    assert r.validate("tell me more about <region1>", [b1]) is None
    assert r.new_boxes([b1]) == []
    r.commit([b1])

    # round 3: new region2 with a newly drawn box -> only the tail is new
    assert r.validate("compare <region1> and <region2>", [b1, b2]) is None
    assert r.new_boxes([b1, b2]) == [b2]
    r.commit([b1, b2])

    # a fresh <region3> without a new drawing -> count mismatch error
    assert "does not match" in r.validate("and <region3> ?", [b1, b2])


def test_sketch_rounds_text_without_region_reference():
    r = SketchRounds()
    err = r.validate("describe the image", [(0.0, 0.0, 10.0, 10.0)])
    assert "correct reference" in err


def test_visualize_overlay_marks_boxes():
    from gpt4roi_tpu.serve.chat import visualize_regions

    img = np.zeros((48, 64, 3), np.uint8)
    out = visualize_regions(img, [(8, 4, 30, 20)])
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn
    # border pixels colored on the box edge
    assert out[4, 8:30].sum() > 0


def test_extract_sketch_boxes_composite_without_background():
    """A composite with no background cannot be stroke-separated — must
    return no boxes rather than a fabricated full-image box."""
    comp = np.full((48, 64, 3), 200, np.uint8)
    assert extract_sketch_boxes({"layers": [], "composite": comp, "background": None}) == []


def test_sketch_rounds_repeated_new_region_name():
    """Repeating one new <regionN> in a single message needs ONE box."""
    r = SketchRounds()
    b1 = (8.0, 4.0, 30.0, 20.0)
    assert r.validate("is <region1> bigger than <region1> looked?", [b1]) is None


def test_recorded_imageeditor_payload_roundflow():
    """Drive extract_sketch_boxes + the full gradio on_ask round flow with
    the checked-in ImageEditor EditorValue payload fixture (anti-aliased
    round-brush strokes, per-stroke RGBA layers, alpha-blended composite —
    the exact dict schema gr.ImageEditor(type='numpy') hands the event
    handler; see tests/fixtures/gen_gradio_payload.py for provenance).
    Closes the headless end of component #22 (reference: gpt4roi/app.py:
    365-388, 395-473)."""
    import os

    from gpt4roi_tpu.serve.app import build_handlers, extract_sketch_boxes

    path = os.path.join(os.path.dirname(__file__), "fixtures", "gradio_imageeditor_payload.npz")
    data = np.load(path)
    value = {
        "background": data["background"],
        "layers": [data["layer_0"], data["layer_1"]],
        "composite": data["composite"],
    }
    drawn = data["drawn_boxes"]  # (2, 4) int32, the intended outlines

    # per-layer extraction: one box per stroke, within brush radius+jitter
    boxes = extract_sketch_boxes(value)
    assert len(boxes) == 2
    for got, want in zip(boxes, drawn):
        assert np.all(np.abs(np.asarray(got) - want.astype(float)) <= 8.0), (got, want)

    # composite fallback (no layers): anti-aliased strokes over a noisy
    # photo fragment under background subtraction (threshold 16), so the
    # fallback over-segments — assert it still LOCATES both strokes
    # (every drawn outline is hit by at least one extracted component);
    # the per-stroke layers path above is what real payloads carry
    v2 = {"background": data["background"], "layers": [], "composite": data["composite"]}
    boxes2 = extract_sketch_boxes(v2)
    assert len(boxes2) >= 2
    for want in drawn:
        hit = any(
            not (b[2] < want[0] - 8 or b[0] > want[2] + 8
                 or b[3] < want[1] - 8 or b[1] > want[3] + 8)
            for b in boxes2
        )
        assert hit, (want, boxes2[:5])

    # full round flow through the headless gradio handlers
    class FakeSession:
        def __init__(self):
            self.calls = []
            self.temperature = 0.0

        def reset(self):
            self.calls.append(("reset",))

        def set_image(self, img):
            self.calls.append(("set_image", img.shape))

        def check_input(self, text, n_new):
            return None

        def add_boxes(self, boxes, shape):
            self.calls.append(("add_boxes", len(boxes), shape))

        def ask(self, text):
            self.calls.append(("ask", text))
            return f"answer about {text}"

    sess = FakeSession()
    on_ask, on_clear = build_handlers(sess)
    history, overlay = on_ask(value, "describe <region1> and <region2>", [])
    assert len(history) == 1 and "answer" in history[0][1]
    assert ("add_boxes", 2, value["background"].shape[:2]) in sess.calls
    assert overlay is not None and overlay.shape[:2] == value["background"].shape[:2]

    # round 2 re-references without new strokes: no new add_boxes
    n_calls = len([c for c in sess.calls if c[0] == "add_boxes"])
    history, _ = on_ask(value, "more about <region1>", history)
    assert len([c for c in sess.calls if c[0] == "add_boxes"]) == n_calls
    assert len(history) == 2

    on_clear()
    assert ("reset",) in sess.calls
