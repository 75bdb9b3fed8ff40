#!/bin/bash
# LW-DETR-small COCO training (TPU). Preset encodes the reference flag set
# (see lwdetr_tpu/config.py PRESETS['small']).
coco_path=$1
python main.py \
    --preset small \
    --coco_path $coco_path \
    --output_dir output/lwdetr_small_coco
