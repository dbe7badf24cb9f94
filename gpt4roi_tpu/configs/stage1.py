# Stage-1 dataset mix (reference: gpt4roi/configs/stage1.py — coco_det,
# RefCOCO, RefCOCO+). Paths follow the reference's ./data layout.
spi_datasets = [
    {
        "type": "CocoDet",
        "ann_file": "./data/coco/annotations/instances_train2017.json",
        "img_prefix": "./data/coco/train2017",
    },
    {
        "type": "RefCOCO",
        "ann_file": "./data/mdetr_annotations/finetune_refcoco_train.json",
        "img_prefix": "./data/coco_all/",
    },
    {
        "type": "RefCOCOP",
        "ann_file": "./data/mdetr_annotations/finetune_refcoco+_train.json",
        "img_prefix": "./data/coco_all/",
    },
]
