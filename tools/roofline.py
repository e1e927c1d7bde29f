#!/usr/bin/env python
"""Roofline accounting: analytic FLOPs per train step vs measured rates.

Counts convolution MACs for each model's forward pass from the same layer
ladders the flax modules build, expands them into the per-iteration work
each trainer actually does (forwards/backwards/extra passes), and divides
the measured rates in BENCH_DETAIL.json by the result to report achieved
FLOP/s and MXU utilization.

Usage: python tools/roofline.py [--peak-tflops 197]
(197 = bf16 peak of one TPU v5e chip)
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def conv_flops(out_hw, cin, cout, k, stride=1, transpose=False):
    """MAC*2 for one conv layer at out_hw x out_hw output.

    For stride-s transposed convs only k^2/s^2 input taps land on each
    output position (the lhs-dilated formulation's zeros contribute
    nothing the compiler must compute)."""
    taps = (k * k) / (stride * stride) if transpose else k * k
    return 2.0 * out_hw * out_hw * cin * cout * taps


def dcgan_g_fwd(size, fg=64, latent=100, ch=3):
    s0 = size // 32
    widths = [fg * 8, fg * 4, fg * 2, fg, fg // 2]
    f = conv_flops(s0, latent, widths[0], s0, 1) / (s0 * s0)  # 1x1 input
    hw = s0
    for cin, cout in zip(widths[:-1], widths[1:]):
        hw *= 2
        f += conv_flops(hw, cin, cout, 4, 2, transpose=True)
    f += conv_flops(hw * 2, widths[-1], ch, 4, 2, transpose=True)
    return f


def dcgan_d_fwd(size, fd=64, ch=3):
    s0 = size // 32
    widths = [fd // 2, fd, fd * 2, fd * 4, fd * 8]
    f, hw, cin = 0.0, size, ch
    for w in widths:
        hw //= 2
        f += conv_flops(hw, cin, w, 4)
        cin = w
    f += conv_flops(1, cin, 1, s0)
    return f


def wgan_g_fwd(size, fg=64, latent=100):
    s0 = size // 32
    widths = [fg * 16, fg * 8, fg * 4, fg * 2, fg]
    f = conv_flops(s0, latent, widths[0], s0, 1) / (s0 * s0)
    hw = s0
    for cin, cout in zip(widths[:-1], widths[1:]):
        hw *= 2
        f += conv_flops(hw, cin, cout, 4, 2, transpose=True)
    f += conv_flops(hw * 2, widths[-1], 3, 4, 2, transpose=True)
    return f


def wgan_c_fwd(size, fd=64):
    s0 = size // 32
    widths = [fd, fd * 2, fd * 4, fd * 8]
    f, hw, cin = 0.0, size, 3
    for w in widths:
        hw //= 2
        f += conv_flops(hw, cin, w, 4)
        cin = w
    f += conv_flops(hw - s0 + 1, cin, 1, s0)
    return f


def resnet50_fwd(size):
    f = conv_flops(size // 2, 3, 64, 7)
    hw, cin = size // 4, 64
    for stage, (blocks, width) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512))):
        if stage > 0:
            hw //= 2
        for b in range(blocks):
            f += conv_flops(hw, cin if b == 0 else width * 4, width, 1)
            f += conv_flops(hw, width, width, 3)
            f += conv_flops(hw, width, width * 4, 1)
            if b == 0:
                f += conv_flops(hw, cin, width * 4, 1)
            cin = width * 4
    return f


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--peak-tflops", type=float, default=197.0)
    p.add_argument("--detail", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL.json"))
    args = p.parse_args()
    bench = json.load(open(args.detail))

    rows = []

    def add(name, key, step_flops_per_img):
        if key not in bench or "imgs_per_sec" not in bench[key]:
            return
        rate = bench[key]["imgs_per_sec"]
        tf = rate * step_flops_per_img / 1e12
        rows.append((name, rate, step_flops_per_img / 1e9, tf,
                     100 * tf / args.peak_tflops))

    # DCGAN iteration = G fwd + G bwd(2x) + D: real fwd+bwd, fake fwd+bwd,
    # G-step fwd + input-bwd  (train_gan.py loop structure)
    for size, key in [(64, "dcgan_train_64px_b128"),
                      (64, "dcgan_train_64px_b128_k8"),
                      (64, "dcgan_train_64px_b256_k8"),
                      (224, "dcgan_train_224px_b128")]:
        g, d = dcgan_g_fwd(size), dcgan_d_fwd(size)
        step = 3 * g + (3 + 2 * 2 + 1) * d
        add(f"DCGAN {size}px train [{key.split('_', 2)[2]}]", key, step)

    # WGAN-GP iteration = n*(G fwd + D: 2 fwd+bwd + GP triple pass) + G step
    g, c = wgan_g_fwd(224), wgan_c_fwd(224)
    n = bench.get("wgan_gp_train_224px_b64", {}).get("critic_iters", 5)
    critic_iter = 3 * g / n + (2 * 3 + 3 * 3) * c  # G fwd amortized rough
    add("WGAN-GP 224px train", "wgan_gp_train_224px_b64",
        n * critic_iter + 3 * g)

    # ResNet-50 frozen: fwd + fc-grad only (backbone bwd DCE'd by XLA)
    r = resnet50_fwd(224)
    add("ResNet50 224px frozen", "resnet50_train_224px_b128", r * 1.05)
    add("ResNet50 224px unfrozen", "resnet50_train_224px_b128_unfrozen",
        r * 3.0)

    print(f"{'workload':28s} {'imgs/s':>10s} {'GFLOP/img':>10s} "
          f"{'TFLOP/s':>8s} {'MXU %':>6s}")
    for name, rate, gflop, tf, util in rows:
        print(f"{name:28s} {rate:10.0f} {gflop:10.2f} {tf:8.1f} "
              f"{util:6.1f}")


if __name__ == "__main__":
    main()
