"""Synthesize an RSNA-layout dataset at the reference's true scale.

The reference protocol trains on 26,684 images at 224px with a 3,000-image
test split (/root/reference/README.md:457-477; metadata semantics
data_loader.py:91,:93). No real RSNA data exists in this environment
(zero egress), so the reference-scale dress rehearsal (VERDICT r4 next #1)
runs on synthesized images with the exact directory/CSV layout:

    {root}/Training/Images/{patientId}.png   + stage2_train_metadata.csv
    {root}/Test/{patientId}.png              + stage2_test_metadata.csv

Images are low-frequency random block textures (28x28 u8 noise repeated
x8 to 224): they PNG-compress ~10x (keeps synthesis + decode fast on this
1-core host) while still exercising every byte of the decode->store->
train->sample->analyze pipeline at the true image count and resolution.
Class balance mirrors RSNA's ~31% Lung Opacity prevalence; positives get
a brighter center blob so the texture statistics differ by class (SSIM /
Grad-CAM panels are then not pure noise-vs-noise).

Run time: ~8-12 min for the full 29,684 images on this host.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
from PIL import Image


def _texture(rng: np.random.Generator, size: int, positive: bool) -> np.ndarray:
    base = rng.integers(0, 256, (size // 8, size // 8, 3), np.uint8)
    img = base.repeat(8, axis=0).repeat(8, axis=1)
    if positive:
        # brighter soft blob in a jittered center region
        c = size // 2 + rng.integers(-size // 8, size // 8, 2)
        y, x = np.ogrid[:size, :size]
        d2 = (y - c[0]) ** 2 + (x - c[1]) ** 2
        blob = (d2 < (size // 4) ** 2)
        img = np.where(blob[..., None],
                       np.minimum(img.astype(np.int16) + 80, 255),
                       img).astype(np.uint8)
    return img


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="/tmp/rsna_scale")
    p.add_argument("--n-train", type=int, default=26684)
    p.add_argument("--n-test", type=int, default=3000)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pos-frac", type=float, default=0.31)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(f"{args.root}/Training/Images", exist_ok=True)
    os.makedirs(f"{args.root}/Test", exist_ok=True)

    t0 = time.time()
    rows = ["patientId,class"]
    for i in range(args.n_train):
        pid = f"p{i:06d}"
        pos = rng.random() < args.pos_frac
        rows.append(f"{pid},{'Lung Opacity' if pos else 'Normal'}")
        Image.fromarray(_texture(rng, args.size, pos)).save(
            f"{args.root}/Training/Images/{pid}.png", compress_level=1)
        if (i + 1) % 2000 == 0:
            print(f"train {i + 1}/{args.n_train} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    with open(f"{args.root}/stage2_train_metadata.csv", "w") as f:
        f.write("\n".join(rows) + "\n")

    rows = ["patientId,PredictionString"]
    for i in range(args.n_test):
        pid = f"t{i:06d}"
        pos = rng.random() < args.pos_frac
        # reference test-label semantics: PredictionString != '0.5 0 0 100 100'
        rows.append(f"{pid},{'0.9 10 10 120 120' if pos else '0.5 0 0 100 100'}")
        Image.fromarray(_texture(rng, args.size, pos)).save(
            f"{args.root}/Test/{pid}.png", compress_level=1)
    with open(f"{args.root}/stage2_test_metadata.csv", "w") as f:
        f.write("\n".join(rows) + "\n")

    du = sum(os.path.getsize(os.path.join(dp, fn))
             for dp, _, fns in os.walk(args.root) for fn in fns)
    print(f"done: {args.n_train} train + {args.n_test} test {args.size}px "
          f"PNGs, {du / 1e9:.2f} GB on disk, {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
