#!/bin/bash
# LW-DETR-tiny COCO training (TPU). Preset encodes the reference flag set
# (see lwdetr_tpu/config.py PRESETS['tiny']).
coco_path=$1
python main.py \
    --preset tiny \
    --coco_path $coco_path \
    --output_dir output/lwdetr_tiny_coco
