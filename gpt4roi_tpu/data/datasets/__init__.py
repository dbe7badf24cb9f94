from gpt4roi_tpu.data.datasets.coco import CocoJson
from gpt4roi_tpu.data.datasets.base import RegionDataset
import gpt4roi_tpu.data.datasets.coco_det  # noqa: F401 (registry)
import gpt4roi_tpu.data.datasets.refcoco  # noqa: F401
import gpt4roi_tpu.data.datasets.vg  # noqa: F401
import gpt4roi_tpu.data.datasets.flickr30k  # noqa: F401
import gpt4roi_tpu.data.datasets.vcr  # noqa: F401
import gpt4roi_tpu.data.datasets.det_llava  # noqa: F401
