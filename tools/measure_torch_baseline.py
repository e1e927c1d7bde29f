#!/usr/bin/env python
"""One-time measurement of the PyTorch-CPU reference DCGAN step rate.

Builds a torch DCGAN equivalent to the reference architecture (generator
ladder S0 -> S with BN+ReLU, discriminator with BN+LeakyReLU — see
reference src/dcgan.py:14-90) and times the reference training iteration
(D real backward + D fake backward + D step + G step, BCE with label
smoothing — reference train_gan.py:119-150) on CPU.

Writes BASELINE_MEASURED.json at the repo root; bench.py reads it to
compute vs_baseline. Run: python tools/measure_torch_baseline.py
"""
import json
import os
import sys
import time

import torch
import torch.nn as nn

torch.manual_seed(0)


def build_generator(latent, fg, size):
    s0 = size // 32
    widths = [fg * 8, fg * 4, fg * 2, fg, fg // 2]
    layers = [nn.ConvTranspose2d(latent, widths[0], s0, 1, 0, bias=False),
              nn.BatchNorm2d(widths[0]), nn.ReLU(True)]
    for cin, cout in zip(widths[:-1], widths[1:]):
        layers += [nn.ConvTranspose2d(cin, cout, 4, 2, 1, bias=False),
                   nn.BatchNorm2d(cout), nn.ReLU(True)]
    layers += [nn.ConvTranspose2d(widths[-1], 3, 4, 2, 1, bias=False),
               nn.Tanh()]
    return nn.Sequential(*layers)


def build_discriminator(fd, size):
    s0 = size // 32
    widths = [fd // 2, fd, fd * 2, fd * 4, fd * 8]
    layers = [nn.Conv2d(3, widths[0], 4, 2, 1, bias=False),
              nn.LeakyReLU(0.2, True)]
    for cin, cout in zip(widths[:-1], widths[1:]):
        layers += [nn.Conv2d(cin, cout, 4, 2, 1, bias=False),
                   nn.BatchNorm2d(cout), nn.LeakyReLU(0.2, True)]
    layers += [nn.Conv2d(widths[-1], 1, s0, 1, 0, bias=False), nn.Sigmoid()]
    return nn.Sequential(*layers)


def measure(size=64, batch=16, latent=100, fg=64, iters=3, warmup=1):
    g = build_generator(latent, fg, size)
    d = build_discriminator(fg, size)
    opt_g = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))
    bce = nn.BCELoss()
    real = torch.randn(batch, 3, size, size)

    def one_step():
        d.zero_grad()
        out_real = d(real).view(-1)
        loss_real = bce(out_real, torch.full((batch,), 0.9))
        loss_real.backward()
        noise = torch.randn(batch, latent, 1, 1)
        fake = g(noise)
        out_fake = d(fake.detach()).view(-1)
        loss_fake = bce(out_fake, torch.zeros(batch))
        loss_fake.backward()
        opt_d.step()
        g.zero_grad()
        out = d(fake).view(-1)
        loss_g = bce(out, torch.full((batch,), 0.9))
        loss_g.backward()
        opt_g.step()

    for _ in range(warmup):
        one_step()
    t0 = time.time()
    for _ in range(iters):
        one_step()
    dt = (time.time() - t0) / iters
    return {"config": {"image_size": size, "batch": batch, "latent": latent,
                       "feature_maps": fg, "threads": torch.get_num_threads()},
            "sec_per_step": dt,
            "imgs_per_sec": batch / dt}


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated result keys to (re)measure")
    args = ap.parse_args()
    print(f"torch {torch.__version__}, threads {torch.get_num_threads()}")
    tasks = {
        # b16: quick smoke; b128: the reference batch (train_gan.py:231),
        # the like-for-like denominator for bench.py's vs_baseline
        "torch_cpu_dcgan_64": lambda: measure(size=64, batch=16),
        "torch_cpu_dcgan_64_b128": lambda: measure(size=64, batch=128,
                                                   iters=2),
    }
    only = set(args.only.split(",")) if args.only else None
    if only is not None:
        unknown = only - set(tasks)
        if unknown:
            ap.error(f"unknown --only keys {sorted(unknown)}; "
                     f"valid: {sorted(tasks)}")
    result = {}
    for key, fn in tasks.items():
        if only is not None and key not in only:
            continue
        print(f"{key}...")
        result[key] = fn()
        print(json.dumps(result[key]))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    merged = {}
    if os.path.exists(out):
        # keep entries this run did not re-measure (e.g. the committed
        # 224px baseline) — never clobber numbers we cannot regenerate
        with open(out) as f:
            merged = json.load(f)
    merged.update(result)
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"wrote {out}")
