"""Fleet client: resolve a worker through the controller and stream a
box-prompted generation (the client role of the reference's
gradio_web_server/cli over the controller HTTP API; reference:
llava/serve/gradio_web_server.py, llava/serve/cli.py).

Usage:
  python -m gpt4roi_tpu.serve.client --controller http://host:21001 \
      --image img.jpg --box 0.1 0.1 0.6 0.7 --prompt "what is <region1>?"
"""

from __future__ import annotations

import argparse
import base64
import json
from typing import Iterator, List, Optional, Sequence


def get_worker(controller_url: str, model: str = "gpt4roi-tpu") -> str:
    import requests

    r = requests.post(
        controller_url.rstrip("/") + "/get_worker_address", json={"model": model}, timeout=10
    )
    addr = r.json().get("address", "")
    if not addr:
        raise RuntimeError(f"no worker serving model {model!r}")
    return addr


def generate_stream(
    worker_url: str,
    prompt: str,
    image_b64: Optional[str] = None,
    boxes: Optional[Sequence[Sequence[float]]] = None,
    temperature: float = 0.2,
    max_new_tokens: int = 256,
) -> Iterator[str]:
    import requests

    req = {
        "prompt": prompt,
        "temperature": temperature,
        "max_new_tokens": max_new_tokens,
    }
    if image_b64:
        req["image_b64"] = image_b64
    if boxes:
        req["boxes"] = [list(b) for b in boxes]
    r = requests.post(
        worker_url.rstrip("/") + "/worker_generate_stream", json=req, stream=True, timeout=600
    )
    for line in r.iter_lines():
        if not line:
            continue
        chunk = json.loads(line)
        if chunk.get("error_code", 0) != 0:
            raise RuntimeError(chunk.get("text", "worker error"))
        yield chunk["text"]


def main() -> None:  # pragma: no cover - CLI glue
    p = argparse.ArgumentParser()
    p.add_argument("--controller", required=True)
    p.add_argument("--model", default="gpt4roi-tpu")
    p.add_argument("--image", default=None)
    p.add_argument("--box", type=float, nargs=4, action="append", default=[],
                   help="normalised x1 y1 x2 y2 (repeatable)")
    p.add_argument("--prompt", required=True)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--max-new-tokens", type=int, default=256)
    args = p.parse_args()

    img_b64 = None
    if args.image:
        with open(args.image, "rb") as f:
            img_b64 = base64.b64encode(f.read()).decode()
    worker = get_worker(args.controller, args.model)
    last = ""
    for text in generate_stream(
        worker, args.prompt, img_b64, args.box, args.temperature, args.max_new_tokens
    ):
        print(text[len(last):], end="", flush=True)
        last = text
    print()


if __name__ == "__main__":
    main()
