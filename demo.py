"""Single-image inference demo (counterpart of /root/reference/demo/demo.py).

  python demo.py --preset tiny --image path.jpg --checkpoint ckpt.pth \
      --output out.jpg --threshold 0.3
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image, ImageDraw

COCO_NAMES = {
    1: "person", 2: "bicycle", 3: "car", 4: "motorcycle", 5: "airplane",
    6: "bus", 7: "train", 8: "truck", 9: "boat", 10: "traffic light",
    11: "fire hydrant", 13: "stop sign", 14: "parking meter", 15: "bench",
    16: "bird", 17: "cat", 18: "dog", 19: "horse", 20: "sheep", 21: "cow",
    22: "elephant", 23: "bear", 24: "zebra", 25: "giraffe", 27: "backpack",
    28: "umbrella", 31: "handbag", 32: "tie", 33: "suitcase", 34: "frisbee",
    35: "skis", 36: "snowboard", 37: "sports ball", 38: "kite",
    39: "baseball bat", 40: "baseball glove", 41: "skateboard",
    42: "surfboard", 43: "tennis racket", 44: "bottle", 46: "wine glass",
    47: "cup", 48: "fork", 49: "knife", 50: "spoon", 51: "bowl", 52: "banana",
    53: "apple", 54: "sandwich", 55: "orange", 56: "broccoli", 57: "carrot",
    58: "hot dog", 59: "pizza", 60: "donut", 61: "cake", 62: "chair",
    63: "couch", 64: "potted plant", 65: "bed", 67: "dining table",
    70: "toilet", 72: "tv", 73: "laptop", 74: "mouse", 75: "remote",
    76: "keyboard", 77: "cell phone", 78: "microwave", 79: "oven",
    80: "toaster", 81: "sink", 82: "refrigerator", 84: "book", 85: "clock",
    86: "vase", 87: "scissors", 88: "teddy bear", 89: "hair drier",
    90: "toothbrush",
}


def main():
    p = argparse.ArgumentParser("LW-DETR TPU demo")
    p.add_argument("--preset", default="tiny")
    p.add_argument("--image", required=True)
    p.add_argument("--checkpoint", default=None, help=".pth or orbax dir")
    p.add_argument("--output", default="demo_out.jpg")
    p.add_argument("--threshold", type=float, default=0.3)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--ema", action="store_true",
                   help="use the EMA weights from an orbax checkpoint")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lwdetr_tpu.config import get_config
    from lwdetr_tpu.data import transforms as T
    from lwdetr_tpu.models.lwdetr import build_model, post_process

    cfg = get_config(args.preset)
    model = build_model(cfg.model)

    image = Image.open(args.image).convert("RGB")
    arr, _ = T.val_transform_square(image, None, args.size)
    images = jnp.asarray(arr)[None]

    if args.checkpoint and args.checkpoint.endswith(".pth"):
        from lwdetr_tpu.train.checkpoint import load_pth

        variables = load_pth(args.checkpoint, cfg.model)
    elif args.checkpoint and os.path.isdir(args.checkpoint):
        from lwdetr_tpu.train.checkpoint import load_orbax_variables

        variables = load_orbax_variables(args.checkpoint, use_ema=args.ema)
    else:
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            images, train=True)
        print("WARNING: random weights (no checkpoint given)")

    @jax.jit
    def fwd(variables, images):
        out = model.apply(variables, images, train=False)
        sizes = jnp.asarray([[image.height, image.width]], jnp.float32)
        return post_process(out["pred_logits"], out["pred_boxes"], sizes,
                            num_select=cfg.model.num_select)

    scores, labels, boxes = jax.device_get(fwd(dict(variables), images))

    draw = ImageDraw.Draw(image)
    kept = 0
    for s, l, b in zip(scores[0], labels[0], boxes[0]):
        if s < args.threshold:
            continue
        kept += 1
        x0, y0, x1, y1 = b.tolist()
        draw.rectangle([x0, y0, x1, y1], outline="red", width=3)
        name = COCO_NAMES.get(int(l), str(int(l)))
        draw.text((x0 + 2, max(y0 - 12, 0)), f"{name} {s:.2f}", fill="red")
    image.save(args.output)
    print(f"{kept} detections >= {args.threshold} -> {args.output}")


if __name__ == "__main__":
    main()
