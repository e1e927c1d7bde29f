#!/usr/bin/env python
"""Train a conditional GAN on the RSNA pneumonia dataset — TPU-native
entry point.

CLI-compatible with the reference script of the same name
(reference src/train_cgan.py:249-274): same flags and defaults. Outputs go
to the per-GAN-type locations its README documents (models/cgan/,
cgan_training_history.json) rather than the reference code's colliding
models/gan/ paths — see xgan/train/cgan_loop.py.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xgan import config


def build_parser():
    p = argparse.ArgumentParser(
        description="Train conditional DCGAN on RSNA Pneumonia Dataset "
                    "(TPU-native)")
    config.add_path_args(p)
    config.add_gan_model_args(p, fm_default=32)
    config.add_gan_train_args(p, epochs=50, batch_size=32,
                              vis_batch_size=32, save_interval=1000,
                              checkpoint_interval=5)
    p.add_argument("--vgg-path", type=str, default="",
                   help="Optional torchvision vgg16 .pth for the "
                        "perceptual loss (no network egress here)")
    config.add_tpu_args(p)
    return p


def main():
    args = build_parser().parse_args()
    config.print_args(args)
    config.apply_device_flag(args)
    from xgan.train.cgan_loop import train_cgan
    train_cgan(args)


if __name__ == "__main__":
    main()
