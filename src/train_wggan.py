#!/usr/bin/env python
"""Train a WGAN-GP on the RSNA pneumonia dataset — TPU-native entry point.

CLI-compatible with the reference script of the same name
(reference src/train_wggan.py:126-155): same flags and defaults including
--critic-iters and --lambda-gp; the gradient-penalty double-backward runs
inside a single compiled XLA step.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xgan import config


def build_parser():
    p = argparse.ArgumentParser(
        description="Train Wasserstein GAN-GP on RSNA Pneumonia images "
                    "(TPU-native)")
    config.add_path_args(p)
    config.add_gan_model_args(p, fm_default=64)
    config.add_gan_train_args(p, epochs=30, batch_size=64,
                              vis_batch_size=64, save_interval=500,
                              checkpoint_interval=10)
    p.add_argument("--critic-iters", type=int, default=5,
                   help="Number of D updates per G update")
    p.add_argument("--lambda-gp", type=float, default=10.,
                   help="Gradient penalty coefficient")
    config.add_tpu_args(p)
    return p


def main():
    args = build_parser().parse_args()
    config.print_args(args)
    config.apply_device_flag(args)
    from xgan.train.wgan_loop import train_wgan
    train_wgan(args)


if __name__ == "__main__":
    main()
