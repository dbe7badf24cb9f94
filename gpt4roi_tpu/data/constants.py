"""Shared token/label constants (reference: llava/model/llava.py:30-33,
llava/constants.py, gpt4roi/models/spi_llava.py:208-212)."""

IGNORE_INDEX = -100
DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"
DEFAULT_BBOX_TOKEN = "<bbox>"
DEFAULT_POINT_TOKEN = "<point>"

SPECIAL_TOKENS = [
    DEFAULT_IMAGE_PATCH_TOKEN,
    DEFAULT_BBOX_TOKEN,
    DEFAULT_POINT_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IM_END_TOKEN,
]

# CLIP image normalisation (the datasets bake x255 into mmcv Normalize:
# gpt4roi/datasets/coco_det.py:55-58)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
