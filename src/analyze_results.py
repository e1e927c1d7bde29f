#!/usr/bin/env python
"""Analyze and compare baseline/augmented/curriculum results — TPU-native.

CLI-compatible with the reference script of the same name
(reference src/analyze_results.py:586-609): same flags including
--skip-plots/--skip-ssim/--skip-gradcam. Consumes the same metrics-JSON
schemas (works on this framework's outputs and on reference-produced
ones); SSIM runs as a batched on-device kernel; Grad-CAM runs on this
framework's ResNet-50 checkpoints.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(
        description="Analyze and compare baseline and augmented model "
                    "results (TPU-native)")
    p.add_argument("--metrics-dir", type=str, default="./results/metrics")
    p.add_argument("--analysis-dir", type=str, default="./results/analysis")
    p.add_argument("--model-dir", type=str, default="./models")
    p.add_argument("--data-dir", type=str, default="./data/processed")
    p.add_argument("--synthetic-dir", type=str, default="./data/synthetic")
    p.add_argument("--num-ssim-real", type=int, default=100)
    p.add_argument("--num-ssim-synth", type=int, default=500)
    p.add_argument("--num-gradcam-samples", type=int, default=3)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--skip-plots", action="store_true")
    p.add_argument("--skip-ssim", action="store_true")
    p.add_argument("--skip-gradcam", action="store_true")
    return p


def main():
    args = build_parser().parse_args()
    from xgan import config
    config.apply_device_flag(args)
    from xgan import analysis
    from xgan.utils import check_create_dir

    check_create_dir(args.analysis_dir)
    metrics_data = {}
    for prefix in ["baseline_", "augmented_", "curriculum_"]:
        loaded = analysis.load_metrics(args.metrics_dir, prefix)
        if loaded:
            metrics_data[prefix[:-1]] = loaded
    if not metrics_data:
        print("Error: No valid metrics loaded. Aborting analysis.")
        return

    if not args.skip_plots:
        print("\nGenerating training comparison plots...")
        analysis.plot_training_comparison(metrics_data, args.analysis_dir)
        print("\nGenerating cross-validation comparison plots...")
        analysis.plot_cv_comparison(metrics_data, args.analysis_dir)

    print("\nGenerating summary report...")
    report = analysis.generate_summary_report(metrics_data,
                                              args.analysis_dir)
    print("\n" + report)

    if not args.skip_ssim:
        analysis.calculate_ssim_distribution(
            args.data_dir, args.synthetic_dir, args.analysis_dir,
            num_real_samples=args.num_ssim_real,
            num_synthetic_samples=args.num_ssim_synth,
            image_size=args.image_size)

    if not args.skip_gradcam:
        analysis.generate_grad_cam_comparison(
            args.model_dir, args.data_dir, args.synthetic_dir,
            args.analysis_dir, num_samples=args.num_gradcam_samples,
            image_size=args.image_size)

    print(f"\nAnalysis complete. Outputs saved to {args.analysis_dir}")


if __name__ == "__main__":
    main()
