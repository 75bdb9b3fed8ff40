#!/bin/bash
# LW-DETR-medium COCO evaluation; $2 = checkpoint (orbax dir or .pth)
coco_path=$1
checkpoint=$2
python main.py \
    --preset medium \
    --coco_path $coco_path \
    --eval --resume $checkpoint \
    --output_dir output/lwdetr_medium_coco_eval
