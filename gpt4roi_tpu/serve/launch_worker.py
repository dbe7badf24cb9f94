"""Worker launch glue: serve a GPT4RoI model behind the controller fleet.

``python -m gpt4roi_tpu.serve.launch_worker --controller http://host:21001
--port 21002 [--model_path ... | --tiny]`` — the TPU-serving equivalent of
the reference's ``python -m llava.serve.model_worker`` (reference:
llava/serve/model_worker.py:330-384).

Request schema (POST /worker_generate_stream):
  {"prompt": str, "image_b64": str?, "boxes": [[x1,y1,x2,y2], ...]?  (normalised),
   "temperature": float?, "max_new_tokens": int?}
Streams ndjson {"error_code": 0, "text": <accumulated text>} chunks.
"""

from __future__ import annotations

import argparse
from typing import Iterator

import numpy as np


def build_generate_stream(session):
    from gpt4roi_tpu.serve.worker import decode_image_b64

    def generate_stream(params: dict) -> Iterator[str]:
        if params.get("image_b64"):
            img = decode_image_b64(params["image_b64"])
            session.reset()
            session.set_image(img)
            if params.get("boxes"):
                session.add_boxes(
                    [[b[0] * img.shape[1], b[1] * img.shape[0],
                      b[2] * img.shape[1], b[3] * img.shape[0]] for b in params["boxes"]],
                    img.shape[:2],
                )
        session.temperature = float(params.get("temperature", session.temperature))
        session.max_new_tokens = int(params.get("max_new_tokens", session.max_new_tokens))
        # true streaming: one emission per device-side decode chunk
        last = ""
        for partial in session.ask_stream(params.get("prompt", "")):
            if partial != last:
                last = partial
                yield partial
        if not last:
            yield ""

    return generate_stream


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--controller", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=21002)
    p.add_argument("--worker-url", default=None)
    p.add_argument("--model_path", default=None)
    p.add_argument("--params_npz", default=None)
    p.add_argument("--model-name", default="gpt4roi-tpu")
    p.add_argument("--limit-concurrency", type=int, default=4)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    from gpt4roi_tpu.serve.app import build_session
    from gpt4roi_tpu.serve.worker import ModelWorker, serve_worker

    session = build_session(args)
    worker_url = args.worker_url or f"http://127.0.0.1:{args.port}"
    worker = ModelWorker(
        args.controller,
        worker_url,
        args.model_name,
        build_generate_stream(session),
        limit_concurrency=args.limit_concurrency,
    )
    httpd = serve_worker(worker, args.host, args.port)
    print(f"worker {worker.worker_id} serving {args.model_name} on {args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
