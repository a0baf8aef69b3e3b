"""Generate a learnable synthetic COCO-2014 layout: colored shapes with
descriptive captions.

Each image shows one colored shape at a quadrant; the caption describes
it ("a red circle in the top left of the image ."). Useful for
end-to-end trainability checks without the real COCO download.

Usage: python tools/make_synthetic_coco.py <root> [--train 300] [--val 40]
"""

import argparse
import json
import os

import numpy as np
from PIL import Image, ImageDraw

COLORS = {"red": (220, 40, 40), "green": (40, 180, 60),
          "blue": (50, 80, 220), "yellow": (230, 210, 40)}
SHAPES = ["circle", "square", "triangle"]
POSITIONS = {"top left": (0.25, 0.25), "top right": (0.75, 0.25),
             "bottom left": (0.25, 0.75), "bottom right": (0.75, 0.75)}


def draw_sample(rng, size=224):
    color = rng.choice(list(COLORS))
    shape = rng.choice(SHAPES)
    pos = rng.choice(list(POSITIONS))
    img = Image.new("RGB", (size, size),
                    tuple(int(v) for v in rng.integers(180, 240, 3)))
    d = ImageDraw.Draw(img)
    cx, cy = (int(POSITIONS[pos][0] * size + rng.integers(-15, 16)),
              int(POSITIONS[pos][1] * size + rng.integers(-15, 16)))
    r = int(rng.integers(25, 45))
    rgb = COLORS[color]
    if shape == "circle":
        d.ellipse([cx - r, cy - r, cx + r, cy + r], fill=rgb)
    elif shape == "square":
        d.rectangle([cx - r, cy - r, cx + r, cy + r], fill=rgb)
    else:
        d.polygon([(cx, cy - r), (cx - r, cy + r), (cx + r, cy + r)],
                  fill=rgb)
    caption = "a {} {} in the {} of the image .".format(color, shape, pos)
    return img, caption


def make_split(root, split, n, seed):
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "cocoapi", "images",
                           "{}2014".format(split))
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    for i in range(n):
        img_id = i + (1 if split == "train" else 100000)
        img, caption = draw_sample(rng)
        file_name = "COCO_{}2014_{:012d}.jpg".format(split, img_id)
        img.save(os.path.join(img_dir, file_name))
        images.append({"id": img_id, "file_name": file_name,
                       "height": 224, "width": 224})
        annotations.append({"id": img_id * 10, "image_id": img_id,
                            "caption": caption})
    anno_dir = os.path.join(root, "cocoapi", "annotations")
    os.makedirs(anno_dir, exist_ok=True)
    with open(os.path.join(
            anno_dir, "captions_{}2014.json".format(split)), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    print("{}: {} images".format(split, n))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("root")
    parser.add_argument("--train", type=int, default=300)
    parser.add_argument("--val", type=int, default=40)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    make_split(args.root, "train", args.train, args.seed)
    make_split(args.root, "val", args.val, args.seed + 1)
    for sub in ("pkldata", "checkpoints", "eval_data"):
        os.makedirs(os.path.join(args.root, sub), exist_ok=True)
