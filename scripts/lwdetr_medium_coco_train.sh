#!/bin/bash
# LW-DETR-medium COCO training (TPU). Preset encodes the reference flag set
# (see lwdetr_tpu/config.py PRESETS['medium']).
coco_path=$1
python main.py \
    --preset medium \
    --coco_path $coco_path \
    --output_dir output/lwdetr_medium_coco
