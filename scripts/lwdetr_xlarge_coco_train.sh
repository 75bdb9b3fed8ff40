#!/bin/bash
# LW-DETR-xlarge COCO training (TPU). Preset encodes the reference flag set
# (see lwdetr_tpu/config.py PRESETS['xlarge']).
coco_path=$1
python main.py \
    --preset xlarge \
    --coco_path $coco_path \
    --output_dir output/lwdetr_xlarge_coco
