"""Dataset classes over synthetic fixtures: structure, <bbox>-token/box
alignment, normalisation, mixture building with ratio subsampling."""

import json
import os
import pickle

import numpy as np
import pytest

from gpt4roi_tpu.data.constants import DEFAULT_BBOX_TOKEN, DEFAULT_IMAGE_PATCH_TOKEN
from gpt4roi_tpu.data.module import BatchLoader, build_spi_dataset, make_multitask_dataset
from gpt4roi_tpu.data.collate import BatchSpec
from tests.toy_tokenizer import ToyTokenizer


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    from PIL import Image

    rng = np.random.default_rng(0)
    for name in ["img1.jpg", "img2.jpg"]:
        arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / name)

    # refcoco/vg/flickr-style COCO json
    images = [
        {"id": 1, "file_name": "img1.jpg", "width": 64, "height": 48,
         "caption": "a red apple on the wooden table"},
        {"id": 2, "file_name": "img2.jpg", "width": 64, "height": 48,
         "caption": "a blue car parked near a tree"},
    ]
    anns = [
        {"id": 1, "image_id": 1, "bbox": [4, 4, 20, 16], "area": 320,
         "category_id": 1, "caption": "the apple", "tokens_positive": [[2, 11]]},
        {"id": 2, "image_id": 1, "bbox": [30, 10, 25, 30], "area": 750,
         "category_id": 1, "caption": "the table", "tokens_positive": [[19, 31]]},
        {"id": 3, "image_id": 2, "bbox": [8, 8, 40, 30], "area": 1200,
         "category_id": 1, "caption": "the car", "tokens_positive": [[2, 10]]},
    ]
    cats = [{"id": 1, "name": "object"}, {"id": 2, "name": "person"}]
    coco = {"images": images, "annotations": anns, "categories": cats}
    with open(root / "ref.json", "w") as f:
        json.dump(coco, f)

    det = dict(coco)
    det["categories"] = [{"id": 1, "name": "person"}, {"id": 2, "name": "car"}]
    det_anns = [dict(a, category_id=(1 if a["id"] % 2 else 2)) for a in anns]
    det["annotations"] = det_anns
    with open(root / "det.json", "w") as f:
        json.dump(det, f)

    # vcr jsonl + metadata
    meta = {"boxes": [[4, 4, 24, 20, 0.9], [30, 10, 55, 40, 0.8]]}
    with open(root / "meta1.json", "w") as f:
        json.dump(meta, f)
    vcr_ann = {
        "img_fn": "img1.jpg",
        "metadata_fn": "meta1.json",
        "objects": ["person", "car"],
        "question_orig": "Is 1 looking at 0 ?",
        "answer_orig": "Yes , 1 is looking at 0 .",
        "rationale_orig": "Because 1 is facing 0 .",
    }
    with open(root / "vcr.jsonl", "w") as f:
        f.write(json.dumps(vcr_ann) + "\n")

    # det_llava: llava json + det pkl
    llava = [
        {
            "image": "img1.jpg",
            "conversations": [
                {"from": "human", "value": "<image>\nWhat is this?"},
                {"from": "gpt", "value": "An apple."},
            ],
        }
    ]
    with open(root / "llava.json", "w") as f:
        json.dump(llava, f)
    dets = [
        {
            "filename": "img1.jpg",
            "pred_bboxes": np.array([[0.1, 0.1, 0.5, 0.5, 0.9], [0.2, 0.2, 0.9, 0.8, 0.1]], np.float32),
            "labels": np.array([0, 5], np.int64),
        }
    ]
    with open(root / "dets.pkl", "wb") as f:
        pickle.dump(dets, f)
    return str(root)


def bbox_count(tok, ids):
    bid = tok.vocab.get(DEFAULT_BBOX_TOKEN)
    return int((np.asarray(ids) == bid).sum()) if bid is not None else 0


def check_sample(tok, s, expect_img_tokens=4):
    pid = tok.vocab[DEFAULT_IMAGE_PATCH_TOKEN]
    assert (np.asarray(s["input_ids"]) == pid).sum() == expect_img_tokens
    assert s["image"].shape == (224, 224, 3)
    assert s["boxes"].ndim == 2 and s["boxes"].shape[1] == 4
    assert s["boxes"].min() >= 0.0 and s["boxes"].max() <= 1.0
    assert len(s["input_ids"]) == len(s["labels"])


@pytest.mark.parametrize("dtype", ["RefCOCO", "RefCOCOP", "RefCOCOG"])
def test_refcoco_family(data_dir, dtype):
    tok = ToyTokenizer(model_max_length=4096)
    ds = build_spi_dataset(
        {"type": dtype, "ann_file": os.path.join(data_dir, "ref.json"), "img_prefix": data_dir},
        tokenizer=tok, patch_size=112,
    )
    assert len(ds) == 2
    s = ds[0]
    check_sample(tok, s)
    assert bbox_count(tok, s["input_ids"]) == len(s["boxes"])


def test_coco_det(data_dir):
    tok = ToyTokenizer(model_max_length=4096)
    ds = build_spi_dataset(
        {"type": "CocoDet", "ann_file": os.path.join(data_dir, "det.json"), "img_prefix": data_dir},
        tokenizer=tok, patch_size=112,
    )
    s = ds[0]
    check_sample(tok, s)
    assert bbox_count(tok, s["input_ids"]) == len(s["boxes"])


def test_vg_and_flickr(data_dir):
    tok = ToyTokenizer(model_max_length=4096)
    for t in ["VGDATA", "flickr30k"]:
        ds = build_spi_dataset(
            {"type": t, "ann_file": os.path.join(data_dir, "ref.json"), "img_prefix": data_dir},
            tokenizer=tok, patch_size=112,
        )
        s = ds[0]
        check_sample(tok, s)
        assert bbox_count(tok, s["input_ids"]) == len(s["boxes"])


def test_vcr_variants(data_dir):
    tok = ToyTokenizer(model_max_length=4096)
    ds = build_spi_dataset(
        {"type": "VCRDataset", "ann_file": os.path.join(data_dir, "vcr.jsonl"), "img_prefix": data_dir},
        tokenizer=tok, patch_size=112,
    )
    assert len(ds) == 1
    s = ds[0]
    check_sample(tok, s)
    assert bbox_count(tok, s["input_ids"]) == 2  # one per object in preamble
    # multi variant: digits 0,1 in question -> two regions
    ds2 = build_spi_dataset(
        {"type": "MultiVCRDataset", "ann_file": os.path.join(data_dir, "vcr.jsonl"), "img_prefix": data_dir},
        tokenizer=tok, patch_size=112,
    )
    if len(ds2):
        s2 = ds2[0]
        assert bbox_count(tok, s2["input_ids"]) == len(s2["boxes"])


def test_det_llava(data_dir):
    tok = ToyTokenizer(model_max_length=4096)
    ds = build_spi_dataset(
        {
            "type": "DetLLava",
            "ann_file": os.path.join(data_dir, "llava.json"),
            "img_prefix": data_dir,
            "det_pkl_path": os.path.join(data_dir, "dets.pkl"),
        },
        tokenizer=tok, patch_size=112, seed=3,
    )
    s = ds[0]
    assert s["image"].shape == (224, 224, 3)
    # either the no-bbox branch (0 boxes) or hint branch (1 box above threshold)
    assert len(s["boxes"]) in (0, 1)
    assert bbox_count(tok, s["input_ids"]) == len(s["boxes"])


def test_mixture_ratio_and_loader(data_dir, tmp_path):
    tok = ToyTokenizer(model_max_length=4096)
    cfg = tmp_path / "mix.py"
    cfg.write_text(
        f"""spi_datasets = [
    {{'type': 'RefCOCO', 'ann_file': '{data_dir}/ref.json', 'img_prefix': '{data_dir}'}},
    {{'type': 'VGDATA', 'ann_file': '{data_dir}/ref.json', 'img_prefix': '{data_dir}', 'ratio': 0.5}},
]
"""
    )
    ds = make_multitask_dataset(str(cfg), tok, patch_size=112)
    assert len(ds) == 3  # 2 + 1 (ratio 0.5 of 2)
    spec = BatchSpec(seq_len=256, max_regions=4, image_size=224, pad_token_id=tok.pad_token_id)
    loader = BatchLoader(ds, batch_size=2, spec=spec, seed=0)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["input_ids"].shape == (2, 256)
    assert b["images"].shape == (2, 224, 224, 3)
