#!/usr/bin/env python
"""Train the ResNet-50 pneumonia classifier — TPU-native entry point.

CLI-compatible with the reference script of the same name
(reference src/train_classifier.py:697-747): same flags/defaults/validation,
same strategy naming (baseline/augmented/curriculum), same metric JSON and
figure outputs, plus TPU-native extras (--image-size, --seed,
--compute-dtype, --pretrained-path for an offline torchvision ImageNet
checkpoint).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xgan import config


def build_parser():
    p = argparse.ArgumentParser(
        description="Train ResNet50 Classifier for Pneumonia Detection "
                    "(TPU-native)")
    config.add_path_args(p)
    p.add_argument("--synthetic-dir", type=str, default="./data/synthetic",
                   help="Directory containing synthetic images")
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--unfreeze", action="store_true",
                   help="Unfreeze base ResNet layers for fine-tuning")
    p.add_argument("--k-folds", type=int, default=5,
                   help="Folds for cross-validation; 1 = single split")
    p.add_argument("--workers", type=int, default=4,
                   help="(compat) host decode workers for the one-time "
                        "store build")
    p.add_argument("--use-synthetic", action="store_true",
                   help="Use synthetic data augmentation")
    p.add_argument("--use-curriculum", action="store_true",
                   help="Phased curriculum (requires --use-synthetic)")
    p.add_argument("--curriculum-schedule", type=str,
                   default="0:0.0, 5:0.25, 10:0.5",
                   help='Schedule "epoch1:ratio1,epoch2:ratio2,..."')
    p.add_argument("--pretrained-path", type=str, default="",
                   help="Optional torchvision resnet50 .pth for ImageNet "
                        "init (no network egress here)")
    p.add_argument("--parallel-folds", action="store_true",
                   help="Train all CV folds simultaneously (vmap-stacked "
                        "fold states; ~k-fold wall-clock speedup)")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize bottleneck-block activations in "
                        "the backward pass (jax.checkpoint; identical "
                        "numerics, ~1.2x step time). DEMOTED after "
                        "measurement: zero max-batch gain at every "
                        "tested point on this chip — ResNet-50/224, "
                        "/448, and ResNet-101 depth (stage-BOUNDARY "
                        "activations dominate and per-block remat "
                        "keeps them; tools/bench_remat.py, BENCH_DETAIL "
                        "remat_*_ab). For effective batch size use "
                        "--grad-accum, which measured 4x.")
    p.add_argument("--remat-scope", default="block",
                   choices=["block", "stage", "nested"],
                   help="--remat granularity. block = jax.checkpoint "
                        "per bottleneck (keeps every block-boundary "
                        "activation — measured zero max-batch gain "
                        "here); stage = checkpoint whole stages, "
                        "keeping only the 4 stage inputs (see "
                        "BENCH_DETAIL remat_stage_ab)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="Split each batch into K sequential microbatches "
                        "inside one program: gradients accumulate, one "
                        "optimizer update fires, only one microbatch's "
                        "activations are live (~K× activation-memory "
                        "reduction; the effective-batch lever for sizes "
                        "past the fused step's HBM ceiling). torch "
                        "accumulation semantics: per-microbatch BN "
                        "batch statistics")
    config.add_tpu_args(p)
    return p


def main():
    args = build_parser().parse_args()
    if args.k_folds < 1:
        print("Error: k-folds must be at least 1.")
        sys.exit(1)
    if args.use_curriculum and not args.use_synthetic:
        print("Warning: --use-curriculum requires --use-synthetic. "
              "Ignoring curriculum schedule.")
        args.use_curriculum = False
    config.print_args(args)
    config.apply_device_flag(args)
    from xgan.train.classifier_loop import train_classifier
    train_classifier(args)


if __name__ == "__main__":
    main()
