"""End-to-end train CLI smoke: the real entry point (gpt4roi_tpu.train.cli
— the reference's train.py / train_stage*.sh surface,
/root/reference/gpt4roi/train/train.py:560-720) over a tiny on-disk
mixture, tiny model, scan-layers + 8-bit fused-apply optimizer, 2 steps on
the 8-virtual-device CPU mesh. Covers the CLI wiring the unit tests reach
only in pieces: dataset config parsing -> loader -> sharded train step ->
JSON step log -> checkpoint save."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mix_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("climix")
    from PIL import Image

    rng = np.random.default_rng(0)
    for name in ["img1.jpg", "img2.jpg"]:
        arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / name)
    images = [
        {"id": 1, "file_name": "img1.jpg", "width": 64, "height": 48,
         "caption": "a red apple on the wooden table"},
        {"id": 2, "file_name": "img2.jpg", "width": 64, "height": 48,
         "caption": "a blue car parked near a tree"},
    ]
    anns = [
        {"id": 1, "image_id": 1, "bbox": [4, 4, 20, 16], "area": 320,
         "category_id": 1, "caption": "the apple"},
        {"id": 2, "image_id": 2, "bbox": [8, 8, 40, 30], "area": 1200,
         "category_id": 1, "caption": "the car"},
    ]
    cats = [{"id": 1, "name": "object"}]
    with open(root / "ref.json", "w") as f:
        json.dump({"images": images, "annotations": anns, "categories": cats}, f)
    # 4 copies of a 2-sample RefCOCO = 8 samples = one global batch on the
    # 8-device mesh at per-device batch 1
    entries = ",\n".join(
        f"    {{'type': 'RefCOCO', 'ann_file': '{root}/ref.json',"
        f" 'img_prefix': '{root}'}}" for _ in range(4)
    )
    (root / "mix.py").write_text(f"spi_datasets = [\n{entries},\n]\n")
    return str(root)


@pytest.mark.slow
def test_cli_stage2_tiny_adamw8bit(mix_dir, tmp_path, capsys):
    from gpt4roi_tpu.train import cli

    out_dir = str(tmp_path / "out")
    cli.main([
        "stage2",
        "--dataset_config", os.path.join(mix_dir, "mix.py"),
        "--output_dir", out_dir,
        "--tiny_model",
        "--per_device_batch_size", "1",
        "--model_max_length", "128",
        "--max_regions", "2",
        "--optimizer", "adamw8bit",
        "--scan_layers",
        "--max_steps", "2",
        "--num_epochs", "2",
        "--save_steps", "100",
        "--logging_steps", "1",
        "--learning_rate", "1e-3",
    ])
    logged = [
        json.loads(line)
        for line in capsys.readouterr().out.splitlines()
        if line.startswith("{")
    ]
    steps = [r for r in logged if "loss" in r]
    assert len(steps) == 2, logged
    assert all(np.isfinite(r["loss"]) for r in steps)
    assert all(np.isfinite(r["grad_norm"]) for r in steps)
    # final checkpoint written (orbax composite dir)
    assert any(os.scandir(out_dir)), "no checkpoint/artifacts written"
