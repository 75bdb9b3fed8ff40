#!/bin/bash
# LW-DETR-large COCO training (TPU). Preset encodes the reference flag set
# (see lwdetr_tpu/config.py PRESETS['large']).
coco_path=$1
python main.py \
    --preset large \
    --coco_path $coco_path \
    --output_dir output/lwdetr_large_coco
