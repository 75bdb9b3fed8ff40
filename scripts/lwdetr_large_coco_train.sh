#!/bin/bash
# LW-DETR-large COCO training (TPU). Preset encodes the reference flag set
# (see lwdetr_tpu/config.py PRESETS['large']); pretrain chain mirrors
# reference scripts/lwdetr_large_coco_train.sh (CAE encoder + o365-pretrained
# detector with the 366->91-class head remap).
coco_path=$1
python main.py \
    --preset large \
    --coco_path $coco_path \
    --pretrained_encoder pretrain_weights/caev2_small_300e_objects365.pth \
    --pretrain_weights pretrain_weights/LWDETR_large_30e_objects365.pth \
    --pretrain_keys_modify_to_load transformer.enc_out_class_embed.0.weight transformer.enc_out_class_embed.1.weight transformer.enc_out_class_embed.2.weight transformer.enc_out_class_embed.3.weight transformer.enc_out_class_embed.4.weight transformer.enc_out_class_embed.5.weight transformer.enc_out_class_embed.6.weight transformer.enc_out_class_embed.7.weight transformer.enc_out_class_embed.8.weight transformer.enc_out_class_embed.9.weight transformer.enc_out_class_embed.10.weight transformer.enc_out_class_embed.11.weight transformer.enc_out_class_embed.12.weight transformer.enc_out_class_embed.0.bias transformer.enc_out_class_embed.1.bias transformer.enc_out_class_embed.2.bias transformer.enc_out_class_embed.3.bias transformer.enc_out_class_embed.4.bias transformer.enc_out_class_embed.5.bias transformer.enc_out_class_embed.6.bias transformer.enc_out_class_embed.7.bias transformer.enc_out_class_embed.8.bias transformer.enc_out_class_embed.9.bias transformer.enc_out_class_embed.10.bias transformer.enc_out_class_embed.11.bias transformer.enc_out_class_embed.12.bias class_embed.weight class_embed.bias \
    --output_dir output/lwdetr_large_coco
