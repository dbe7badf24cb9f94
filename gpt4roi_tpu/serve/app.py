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


def gradio_app(session):  # pragma: no cover - requires gradio
    import gradio as gr

    from gpt4roi_tpu.serve.chat import visualize_regions

    state = {"img": None}

    def on_image(img):
        state["img"] = np.asarray(img)
        session.reset()
        session.set_image(state["img"])
        return "image loaded - draw boxes then ask about <region1>, <region2>, ..."

    def on_box(x1, y1, x2, y2):
        session.add_boxes([[x1, y1, x2, y2]], state["img"].shape[:2])
        boxes_px = [
            [b[0] * state["img"].shape[1], b[1] * state["img"].shape[0],
             b[2] * state["img"].shape[1], b[3] * state["img"].shape[0]]
            for b in session.boxes
        ]
        return visualize_regions(state["img"], boxes_px)

    def on_ask(text, history):
        err = session.check_input(text, 0)
        if err:
            return history + [[text, err]]
        return history + [[text, session.ask(text)]]

    with gr.Blocks(title="GPT4RoI-TPU") as demo:
        gr.Markdown("## GPT4RoI-TPU — region-level chat")
        with gr.Row():
            img_in = gr.Image(label="image")
            img_vis = gr.Image(label="regions")
        status = gr.Textbox(label="status")
        with gr.Row():
            x1 = gr.Number(label="x1"); y1 = gr.Number(label="y1")
            x2 = gr.Number(label="x2"); y2 = gr.Number(label="y2")
            add = gr.Button("add region")
        chat = gr.Chatbot()
        txt = gr.Textbox(label="message")
        img_in.change(on_image, img_in, status)
        add.click(on_box, [x1, y1, x2, y2], img_vis)
        txt.submit(on_ask, [txt, chat], chat)
    demo.launch(server_name="0.0.0.0")


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
