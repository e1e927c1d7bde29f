#!/usr/bin/env python
"""Train a DCGAN on the RSNA pneumonia dataset — TPU-native entry point.

CLI-compatible with the reference script of the same name
(reference src/train_gan.py:213-249): same flags, defaults, output files
(models/gan/*, results/gan_images/*, gan_training_history.json,
gan_loss_curve.png), plus TPU-native extras (see --help).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xgan import config


def build_parser():
    p = argparse.ArgumentParser(
        description="Train DCGAN on RSNA Pneumonia Dataset (TPU-native)")
    config.add_path_args(p)
    config.add_gan_model_args(p, fm_default=64)
    config.add_gan_train_args(p, epochs=50, batch_size=128,
                              vis_batch_size=64, save_interval=500,
                              checkpoint_interval=10)
    config.add_tpu_args(p)
    return p


def main():
    args = build_parser().parse_args()
    config.print_args(args)
    config.apply_device_flag(args)
    from xgan.train.gan_loop import train_dcgan
    train_dcgan(args)


if __name__ == "__main__":
    main()
