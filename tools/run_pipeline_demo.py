#!/usr/bin/env python
"""One-command demo of the full pipeline on a synthesized fixture dataset.

Chain (the reference's documented workflow, README.md of the reference):
  1. synthesize an RSNA-layout fixture dataset (no Kaggle egress here)
  2. train a small DCGAN                      (src/train_gan.py)
  3. generate synthetic images                (src/generate_synthetic.py)
  4. train classifiers: baseline + augmented + curriculum, 2-fold CV
                                              (src/train_classifier.py)
  5. analyze: comparison plots, report, SSIM, Grad-CAM
                                              (src/analyze_results.py)
  6. batch-classify the synthetic images with the trained single-run
     checkpoint                               (src/predict.py)
  7. export the trained generator as a portable StableHLO serving
     artifact (reload + numeric self-check)   (src/export_model.py)

Usage: python tools/run_pipeline_demo.py [--workdir DIR] [--image-size 32]
       [--tpu]   (default runs on CPU; --tpu uses the default backend)
"""
import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_fixture(root: str, n_train=24, n_test=10):
    import numpy as np
    from PIL import Image
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/Training/Images", exist_ok=True)
    os.makedirs(f"{root}/Test", exist_ok=True)
    rows = ["patientId,class"]
    for i in range(n_train):
        pid = f"p{i:03d}"
        rows.append(f"{pid},{'Lung Opacity' if i % 2 else 'Normal'}")
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
                        ).save(f"{root}/Training/Images/{pid}.png")
    open(f"{root}/stage2_train_metadata.csv", "w").write(
        "\n".join(rows) + "\n")
    rows = ["patientId,PredictionString"]
    for i in range(n_test):
        pid = f"t{i:03d}"
        ps = "0.5 0 0 100 100" if i % 2 else "0.9 1 1 50 50"
        rows.append(f"{pid},{ps}")
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
                        ).save(f"{root}/Test/{pid}.png")
    open(f"{root}/stage2_test_metadata.csv", "w").write(
        "\n".join(rows) + "\n")


def run(script, *flags):
    cmd = [sys.executable, os.path.join(ROOT, "src", script), *flags]
    print("\n$ " + " ".join(cmd))
    subprocess.run(cmd, check=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/xgan_demo")
    p.add_argument("--image-size", type=int, default=32)
    p.add_argument("--tpu", action="store_true",
                   help="use the default (TPU) backend instead of CPU")
    args = p.parse_args()

    w = args.workdir
    data = f"{w}/data/processed"
    synth = f"{w}/data/synthetic"
    make_fixture(data)

    common = ["--data-dir", data, "--model-dir", f"{w}/models",
              "--results-dir", f"{w}/results/metrics",
              "--figures-dir", f"{w}/results/figures",
              "--cache-dir", f"{w}/cache",
              "--image-size", str(args.image_size)]
    dev = [] if args.tpu else ["--cpu"]
    size_flags = ["--feature-maps-g", "8", "--feature-maps-d", "8",
                  "--latent-dim", "16"]

    run("train_gan.py", *common, *dev, *size_flags,
        "--output-dir", f"{w}/results", "--epochs", "2",
        "--batch-size", "8", "--vis-batch-size", "8")
    run("generate_synthetic.py", *dev,
        "--model-path", f"{w}/models/gan/generator_final.msgpack",
        "--output-dir", synth, "--num-images", "16", "--latent-dim", "16",
        "--feature-maps-g", "8", "--image-size", str(args.image_size),
        "--batch-size", "8")
    for strat in (
            [],
            ["--use-synthetic"],
            ["--use-synthetic", "--use-curriculum",
             "--curriculum-schedule", "0:0.0,1:0.5"]):
        run("train_classifier.py", *common, *dev,
            "--synthetic-dir", synth, "--epochs", "2", "--batch-size", "8",
            "--k-folds", "2", *strat)
    # one single-run model so the analyzer's Grad-CAM finds a
    # {strategy}_resnet50 checkpoint (CV runs only write fold-prefixed
    # checkpoints, exactly like the reference)
    run("train_classifier.py", *common, *dev,
        "--synthetic-dir", synth, "--epochs", "1", "--batch-size", "8",
        "--k-folds", "1")
    run("analyze_results.py", *dev,
        "--metrics-dir", f"{w}/results/metrics",
        "--analysis-dir", f"{w}/results/analysis",
        "--model-dir", f"{w}/models", "--data-dir", data,
        "--synthetic-dir", synth,
        "--image-size", str(args.image_size),
        "--num-ssim-real", "10", "--num-ssim-synth", "10")
    # The best-val checkpoint is only written when val accuracy improves
    # past 0 (reference best-model semantics, classifier_loop.py) — a
    # degenerate run on the random fixture can finish without one, which
    # the analyzer tolerates; tolerate it here too instead of aborting
    # the demo at its final step.
    ckpt = f"{w}/models/baseline_resnet50.msgpack"
    if os.path.exists(ckpt):
        run("predict.py", *dev,
            "--model-path", ckpt,
            "--input-dir", synth,
            "--output", f"{w}/results/predictions.json",
            "--image-size", str(args.image_size), "--batch-size", "8")
    else:
        print(f"Note: {ckpt} was not written (no val-accuracy "
              "improvement); skipping the predict.py step.")
    run("export_model.py", *dev, "--kind", "gan",
        "--model-path", f"{w}/models/gan/generator_final.msgpack",
        "--output", f"{w}/models/gan/generator.stablehlo",
        "--latent-dim", "16", "--feature-maps-g", "8",
        "--image-size", str(args.image_size))

    print(f"\nDemo complete. Artifacts under {w}/results "
          f"(metrics/, figures/, analysis/, predictions.json) and "
          f"{w}/models/gan/generator.stablehlo.")


if __name__ == "__main__":
    main()
