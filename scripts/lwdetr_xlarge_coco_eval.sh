#!/bin/bash
# LW-DETR-xlarge COCO evaluation; $2 = checkpoint (orbax dir or .pth)
coco_path=$1
checkpoint=$2
python main.py \
    --preset xlarge \
    --coco_path $coco_path \
    --eval --resume $checkpoint \
    --output_dir output/lwdetr_xlarge_coco_eval
