"""Generate a gradio ImageEditor payload fixture (EditorValue schema).

Provenance: gradio is not installed in this environment and there is no
network egress, so a live-capture of a browser session is impossible here.
This generator instead reproduces, byte-for-byte in structure, what
``gr.ImageEditor(type="numpy")`` delivers to an event handler in gradio
4.x (``EditorValue``): ``{"background": HxWx3 uint8, "layers": [HxWx4
RGBA uint8, ...], "composite": HxWx4 uint8}`` — one RGBA layer per brush
stroke, anti-aliased round-brush strokes with hand jitter, composite =
background alpha-blended with the layers. The brush strokes trace box
outlines the way a user draws regions in the demo (reference UI:
gpt4roi/app.py:365-388).

Run ``python tests/fixtures/gen_gradio_payload.py`` to regenerate
``gradio_imageeditor_payload.npz``.
"""

import os

import numpy as np


def _brush_stamp(layer, cx, cy, radius, color):
    """Anti-aliased circular brush stamp (RGBA over the layer)."""
    h, w = layer.shape[:2]
    x0, x1 = max(0, int(cx - radius - 2)), min(w, int(cx + radius + 3))
    y0, y1 = max(0, int(cy - radius - 2)), min(h, int(cy + radius + 3))
    if x0 >= x1 or y0 >= y1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    a = np.clip(radius + 0.5 - d, 0.0, 1.0)  # 1 inside, AA fringe at edge
    alpha = (a * 255).astype(np.uint8)
    patch = layer[y0:y1, x0:x1]
    keep = patch[..., 3] >= alpha
    for c in range(3):
        patch[..., c] = np.where(keep, patch[..., c], color[c])
    patch[..., 3] = np.maximum(patch[..., 3], alpha)


def _stroke_rect_outline(shape, box, color, radius, jitter, rng):
    """One brush stroke tracing a rectangle outline with hand jitter."""
    h, w = shape
    layer = np.zeros((h, w, 4), np.uint8)
    x1, y1, x2, y2 = box
    path = []
    for t in np.linspace(0, 1, 160):
        p = t * 4.0
        if p < 1:
            x, y = x1 + p * (x2 - x1), y1
        elif p < 2:
            x, y = x2, y1 + (p - 1) * (y2 - y1)
        elif p < 3:
            x, y = x2 - (p - 2) * (x2 - x1), y2
        else:
            x, y = x1, y2 - (p - 3) * (y2 - y1)
        path.append((x + rng.normal(0, jitter), y + rng.normal(0, jitter)))
    for x, y in path:
        _brush_stamp(layer, x, y, radius, color)
    return layer


def main() -> None:
    rng = np.random.default_rng(7)
    h, w = 480, 640
    # photo-like background: smooth gradients + low-frequency noise
    yy, xx = np.mgrid[0:h, 0:w]
    bg = np.stack(
        [
            120 + 80 * np.sin(xx / 97.0) + 20 * np.cos(yy / 53.0),
            100 + 60 * np.cos(xx / 71.0 + 1.0) + 30 * np.sin(yy / 89.0),
            90 + 50 * np.sin((xx + yy) / 131.0),
        ],
        axis=-1,
    )
    bg = np.clip(bg + rng.normal(0, 6, bg.shape), 0, 255).astype(np.uint8)

    boxes = [(96, 120, 285, 330), (380, 60, 560, 210)]
    colors = [(234, 67, 53), (66, 133, 244)]
    layers = [
        _stroke_rect_outline((h, w), b, c, radius=3.0, jitter=1.2, rng=rng)
        for b, c in zip(boxes, colors)
    ]

    comp = np.concatenate([bg, np.full((h, w, 1), 255, np.uint8)], axis=-1).astype(np.float64)
    for layer in layers:
        a = (layer[..., 3:4].astype(np.float64)) / 255.0
        comp[..., :3] = layer[..., :3] * a + comp[..., :3] * (1 - a)
    comp = np.clip(comp, 0, 255).astype(np.uint8)

    out = os.path.join(os.path.dirname(__file__), "gradio_imageeditor_payload.npz")
    np.savez_compressed(
        out,
        background=bg,
        composite=comp,
        layer_0=layers[0],
        layer_1=layers[1],
        drawn_boxes=np.asarray(boxes, np.int32),
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
