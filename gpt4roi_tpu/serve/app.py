"""Gradio box-drawing chat app (reference: gpt4roi/app.py:395-473).

Launches the ChatSession behind a sketch-box UI when gradio is available;
falls back to a terminal chat loop otherwise (gradio is not baked into the
TPU image — the UI layer is optional, the serving engine is not).
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np


def build_session(args) -> "ChatSession":
    import jax
    import jax.numpy as jnp

    from gpt4roi_tpu.models.gpt4roi import Gpt4RoiConfig, init_gpt4roi_params
    from gpt4roi_tpu.serve.chat import ChatSession
    from gpt4roi_tpu.serve.engine import Engine, EngineConfig
    from gpt4roi_tpu.train.checkpoints import load_params_npz
    from gpt4roi_tpu.train.cli import build_tokenizer

    if args.tiny:
        from tests.toy_tokenizer import ToyTokenizer

        cfg = Gpt4RoiConfig.tiny(vocab_size=512)
        tokenizer = ToyTokenizer(model_max_length=2048)
        params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg)
    else:
        tokenizer = build_tokenizer(args.model_path, 2048)
        from gpt4roi_tpu.data.constants import SPECIAL_TOKENS
        from gpt4roi_tpu.models.llama import LlamaConfig

        ids = tokenizer.convert_tokens_to_ids(SPECIAL_TOKENS)
        cfg = Gpt4RoiConfig(
            llama=LlamaConfig.llama_7b(vocab_size=len(tokenizer)),
            im_patch_token_id=ids[0],
            bbox_token_id=ids[1],
            point_token_id=ids[2],
            im_start_token_id=ids[3],
            im_end_token_id=ids[4],
        )
        params = init_gpt4roi_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        if args.params_npz:
            params = load_params_npz(args.params_npz, params)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    engine = Engine(params, cfg, EngineConfig(compute_dtype=dtype))
    return ChatSession(engine, tokenizer, temperature=args.temperature)


def cli_chat(session) -> None:
    from PIL import Image

    print("gpt4roi-tpu chat. Commands: /image <path>, /box x1 y1 x2 y2, /reset, /quit")
    img_hw: Optional[tuple] = None
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            continue
        if line == "/quit":
            break
        if line == "/reset":
            session.reset()
            continue
        if line.startswith("/image "):
            arr = np.asarray(Image.open(line.split(None, 1)[1]).convert("RGB"))
            session.set_image(arr)
            img_hw = arr.shape[:2]
            print(f"image loaded {img_hw}")
            continue
        if line.startswith("/box "):
            vals = [float(v) for v in line.split()[1:5]]
            assert img_hw is not None, "load an image first"
            session.add_boxes([vals], img_hw)
            print(f"region{len(session.boxes)} added")
            continue
        err = session.check_input(line, 0)
        if err:
            print(err)
            continue
        print(session.ask(line))


def extract_sketch_boxes(editor_value) -> list:
    """Boxes (pixel xyxy, draw order) from a gradio ImageEditor payload:
    prefer per-stroke layers; fall back to connected components of the
    composite (background-subtracted) mask. Headless — exercised by
    tests/test_sketch.py without gradio."""
    from gpt4roi_tpu.serve.sketch import layers_to_boxes, mask_to_boxes

    layers = editor_value.get("layers") or []
    boxes = layers_to_boxes([np.asarray(l) for l in layers])
    if boxes:
        return boxes
    comp = editor_value.get("composite")
    bg = editor_value.get("background")
    if comp is None or bg is None:
        # without a background to subtract, the composite IS the photo —
        # treating its pixels as strokes would fabricate a full-image box
        return []
    comp = np.asarray(comp)
    diff = np.abs(comp[..., :3].astype(np.int16) - np.asarray(bg)[..., :3].astype(np.int16))
    return mask_to_boxes(diff.max(axis=2) > 16)


def build_handlers(session):
    """Headless gradio event handlers (on_ask, on_clear) over a chat
    session — separated from the gradio widget wiring so the full
    draw-a-box round flow is drivable without gradio installed
    (tests/test_sketch.py runs it against a recorded ImageEditor payload
    fixture; reference flow: gpt4roi/app.py:242-328, 365-388)."""
    from gpt4roi_tpu.serve.chat import visualize_regions
    from gpt4roi_tpu.serve.sketch import SketchRounds

    state = {"img": None, "rounds": SketchRounds()}

    def on_ask(editor_value, text, history):
        img = editor_value.get("background") if isinstance(editor_value, dict) else editor_value
        if img is None:
            return history + [[text, "Please upload an image first."]], None
        img = np.asarray(img)[..., :3]
        if state["img"] is None or img.shape != state["img"].shape or (img != state["img"]).any():
            state["img"] = img
            state["rounds"].reset()
            session.reset()
            session.set_image(img)
        all_boxes = extract_sketch_boxes(editor_value if isinstance(editor_value, dict) else {})
        err = state["rounds"].validate(text, all_boxes)
        if err is not None:
            return history + [[text, err]], None
        new = state["rounds"].new_boxes(all_boxes)
        # run ALL validation before mutating any state: committing boxes
        # the session then rejects would desynchronize region bookkeeping
        err = session.check_input(text, len(new))
        if err:
            return history + [[text, err]], None
        if new:
            session.add_boxes(new, img.shape[:2])
        state["rounds"].commit(all_boxes)
        overlay = visualize_regions(img, all_boxes)
        return history + [[text, session.ask(text)]], overlay

    def on_clear():
        state["img"] = None
        state["rounds"].reset()
        session.reset()
        return None, [], None

    return on_ask, on_clear


def gradio_app(session):  # pragma: no cover - requires gradio
    """Draw-a-box chat (reference gpt4roi/app.py:395-473): upload an image,
    sketch boxes on it, reference them as <region1>, <region2>, ... —
    region indices are global across chat rounds."""
    import gradio as gr

    on_ask, on_clear = build_handlers(session)

    with gr.Blocks(title="GPT4RoI-TPU") as demo:
        gr.Markdown(
            "## GPT4RoI-TPU — region-level chat\n"
            "Upload an image, **draw boxes** on it, then ask about "
            "`<region1>`, `<region2>`, ... (indices follow drawing order "
            "across all rounds)."
        )
        with gr.Row():
            editor = gr.ImageEditor(
                label="image (draw the boxes here)", type="numpy",
                brush=gr.Brush(default_size=6),
            )
            img_vis = gr.Image(label="regions")
        chat = gr.Chatbot()
        txt = gr.Textbox(label="message", placeholder="What is <region1> doing?")
        clear = gr.Button("Clear All")
        txt.submit(on_ask, [editor, txt, chat], [chat, img_vis]).then(
            lambda: "", None, txt
        )
        clear.click(on_clear, None, [editor, chat, img_vis])
    demo.queue().launch(server_name="0.0.0.0")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None)
    p.add_argument("--params_npz", default=None)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--no-ui", action="store_true")
    args = p.parse_args()
    session = build_session(args)
    if args.no_ui:
        cli_chat(session)
        return
    try:
        import gradio  # noqa: F401

        gradio_app(session)
    except ImportError:
        print("gradio not installed - falling back to terminal chat")
        cli_chat(session)


if __name__ == "__main__":
    main()
