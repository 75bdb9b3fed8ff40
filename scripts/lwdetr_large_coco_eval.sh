#!/bin/bash
# LW-DETR-large COCO evaluation; $2 = checkpoint (orbax dir or .pth)
coco_path=$1
checkpoint=$2
python main.py \
    --preset large \
    --coco_path $coco_path \
    --eval --resume $checkpoint \
    --output_dir output/lwdetr_large_coco_eval
