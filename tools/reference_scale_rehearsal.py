"""Reference-scale dress rehearsal on the real chip (VERDICT r4 next #1).

Runs the reference's FULL protocol (README.md:457-477: 26,684 train
images at 224px, DCGAN fg=64 batch 128 for 30 epochs = 7,110 steps,
5,000 synthetic images, 5-fold CV for all three strategies, both
analyzers) end-to-end on a synthesized RSNA-layout dataset at the true
count/resolution (tools/make_scale_dataset.py), with:

- a mid-GAN-run SIGTERM + `--resume-from auto` (the preemption path at
  scale),
- per-phase wall-clock, child peak host RSS, and per-epoch step-time
  drift (the long-run soak metrics of VERDICT r4 next #7),
- the LITERAL reference analyze_results.py executed unchanged on the
  produced metrics (plots/report path, import stubs as in
  tests/test_reference_analyzer.py),
- a final JSON written to --out/rehearsal.json; merge the summary into
  BENCH_DETAIL.json as `reference_scale_rehearsal` with --record.

Usage:
  python tools/make_scale_dataset.py --root /tmp/rsna_scale   # once
  python tools/reference_scale_rehearsal.py --data-dir /tmp/rsna_scale \
      --out /tmp/rehearsal [--phases gan,sample,cv,analyze,ref_analyze] \
      [--record]
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import signal
import subprocess
import sys
import textwrap
import threading
import time

REPO = pathlib.Path(__file__).resolve().parent.parent


def _rss_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


class Phase:
    """Run one subprocess; stream its stdout to a log file, poll peak
    RSS, optionally SIGTERM it when a stdout line matches a trigger."""

    def __init__(self, name, cmd, log_path, sigterm_on: str | None = None):
        self.name, self.cmd, self.log_path = name, cmd, log_path
        self.sigterm_on = sigterm_on
        self.peak_rss_kb = 0
        self.lines: list[str] = []

    def run(self, timeout=14400):
        t0 = time.time()
        signalled = False
        with open(self.log_path, "w") as log:
            proc = subprocess.Popen(
                self.cmd, cwd=str(REPO), stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True, bufsize=1,
                env={**os.environ, "PYTHONUNBUFFERED": "1"})

            def poll_rss():
                while proc.poll() is None:
                    self.peak_rss_kb = max(self.peak_rss_kb,
                                           _rss_kb(proc.pid))
                    time.sleep(2)

            th = threading.Thread(target=poll_rss, daemon=True)
            th.start()
            for line in proc.stdout:
                log.write(line)
                log.flush()
                self.lines.append(line.rstrip())
                if (self.sigterm_on and not signalled
                        and re.search(self.sigterm_on, line)):
                    print(f"[{self.name}] trigger matched -> SIGTERM",
                          flush=True)
                    proc.send_signal(signal.SIGTERM)
                    signalled = True
            rc = proc.wait(timeout=timeout)
        secs = time.time() - t0
        print(f"[{self.name}] rc={rc} {secs:.0f}s "
              f"peakRSS={self.peak_rss_kb / 1e6:.2f}GB", flush=True)
        return {"rc": rc, "seconds": round(secs, 1),
                "peak_rss_gb": round(self.peak_rss_kb / 1e6, 3),
                "sigterm_sent": signalled}


def epoch_times(lines):
    """Per-epoch wall seconds from 'Epoch N/M Summary - Time: X.XXs'."""
    out = []
    for ln in lines:
        m = re.search(r"Epoch (\d+)/\d+ Summary - Time: ([0-9.]+)s", ln)
        if m:
            out.append((int(m.group(1)), float(m.group(2))))
    return out


REF_STUBS = textwrap.dedent("""
    import sys, types
    def _mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m
    class _Xform:
        def __init__(self, *a, **k): pass
        def __call__(self, x): return x
    _mod("skimage"); _mod("skimage.metrics",
                          structural_similarity=lambda *a, **k: 0.5)
    _tr = _mod("torchvision.transforms", Compose=_Xform, Resize=_Xform,
               RandomHorizontalFlip=_Xform, ToTensor=_Xform,
               Normalize=_Xform)
    _models = _mod("torchvision.models", resnet50=lambda *a, **k: None,
                   ResNet50_Weights=type("W", (), {"IMAGENET1K_V1": None}))
    _ds = _mod("torchvision.datasets")
    _mod("torchvision", transforms=_tr, models=_models, datasets=_ds)
    _mt = _mod("pytorch_grad_cam.utils.model_targets",
               ClassifierOutputTarget=object)
    _im = _mod("pytorch_grad_cam.utils.image",
               show_cam_on_image=lambda *a, **k: None,
               preprocess_image=lambda *a, **k: None)
    _u = _mod("pytorch_grad_cam.utils", model_targets=_mt, image=_im)
    _mod("pytorch_grad_cam", GradCAM=object, utils=_u)
    sys.path.insert(0, "/root/reference/src")
    sys.argv = ARGV
    import analyze_results
    analyze_results.main()
    print("REF_ANALYZER_OK")
""")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="/tmp/rsna_scale")
    p.add_argument("--out", default="/tmp/rehearsal")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--preempt-epoch", type=int, default=12)
    p.add_argument("--num-images", type=int, default=5000)
    p.add_argument("--cv-epochs", type=int, default=15)
    p.add_argument("--k-folds", type=int, default=5)
    p.add_argument("--phases",
                   default="gan,sample,cv,single,unfrozen,analyze,"
                           "ref_analyze")
    p.add_argument("--record", action="store_true",
                   help="merge the summary into BENCH_DETAIL.json")
    p.add_argument("--cpu", action="store_true",
                   help="pass --cpu to every CLI (orchestration smoke "
                        "tests at tiny scale; the rehearsal itself runs "
                        "on the default TPU backend)")
    p.add_argument("--gan-extra", default="",
                   help="extra space-separated flags for the GAN phase "
                        "(smoke tests shrink shapes here)")
    p.add_argument("--clf-extra", default="",
                   help="extra flags for classifier phases")
    p.add_argument("--sample-extra", default="",
                   help="extra flags for the sampler phase")
    p.add_argument("--analyze-extra", default="",
                   help="extra flags for our analyzer phase")
    args = p.parse_args()

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    phases = args.phases.split(",")
    res_path = out / "rehearsal.json"
    results = json.loads(res_path.read_text()) if res_path.exists() else {}

    base = [sys.executable]
    common = ["--data-dir", args.data_dir,
              "--model-dir", str(out / "models"),
              "--output-dir", str(out / "results"),
              "--results-dir", str(out / "results/metrics"),
              "--figures-dir", str(out / "results/figures"),
              "--cache-dir", str(out / "cache")]

    train_store_gb = 26684 * 224 * 224 * 3 / 1e9

    if "gan" in phases:
        # part 1: run until SIGTERM at the configured epoch boundary
        gan_cmd = base + ["src/train_gan.py"] + common + [
            "--epochs", str(args.epochs), "--batch-size", "128",
            "--feature-maps-g", "64", "--feature-maps-d", "64",
            "--image-size", "224", "--seed", "0"] + \
            (args.gan_extra.split() if args.gan_extra else []) + \
            (["--cpu"] if args.cpu else [])
        ph = Phase("gan_part1", gan_cmd, out / "gan_part1.log",
                   sigterm_on=rf"Epoch {args.preempt_epoch}/{args.epochs} "
                              rf"Summary")
        r1 = ph.run()
        et1 = epoch_times(ph.lines)
        # part 2: resume from the preemption snapshot and finish
        ph2 = Phase("gan_resume", gan_cmd + ["--resume-from", "auto"],
                    out / "gan_resume.log")
        r2 = ph2.run()
        et2 = epoch_times(ph2.lines)
        steady1 = [t for e, t in et1 if e > 2]
        steady2 = [t for e, t in et2 if e > args.preempt_epoch + 2]
        results["gan"] = {
            "part1": r1, "resume": r2,
            "epochs_part1": len(et1), "epochs_resume": len(et2),
            "epoch_seconds_first3": [t for _, t in et1[:3]],
            "epoch_seconds_steady_part1": round(
                sum(steady1) / max(len(steady1), 1), 2),
            "epoch_seconds_steady_resume": round(
                sum(steady2) / max(len(steady2), 1), 2),
            # soak: drift = late steady epochs vs early steady epochs
            "epoch_seconds_last3": [t for _, t in et2[-3:]],
            "train_store_gb": round(train_store_gb, 2),
        }
        res_path.write_text(json.dumps(results, indent=1))

    if "sample" in phases:
        cmd = base + ["src/generate_synthetic.py",
                      "--model-path",
                      str(out / "models/gan/generator_final.msgpack"),
                      "--output-dir", str(out / "synthetic"),
                      "--num-images", str(args.num_images),
                      "--batch-size", "64", "--feature-maps-g", "64",
                      "--image-size", "224", "--seed", "0"] + \
            (args.sample_extra.split() if args.sample_extra else []) + \
            (["--cpu"] if args.cpu else [])
        ph = Phase("sample", cmd, out / "sample.log")
        r = ph.run()
        rates = {}
        for ln in ph.lines:
            m = re.search(r"([0-9.]+) imgs/s device\+transfer", ln)
            if m:
                rates["device_plus_transfer_imgs_per_sec"] = float(
                    m.group(1))
            m = re.search(r"([0-9.]+) imgs/s device compute", ln)
            if m:
                rates["device_compute_imgs_per_sec"] = float(m.group(1))
        results["sample"] = {**r, **rates,
                             "num_images": args.num_images}
        res_path.write_text(json.dumps(results, indent=1))

    if "cv" in phases:
        for strategy, extra in (
                ("baseline", []),
                ("augmented", ["--use-synthetic"]),
                ("curriculum", ["--use-synthetic", "--use-curriculum"])):
            cmd = base + ["src/train_classifier.py"] + common + [
                "--epochs", str(args.cv_epochs),
                "--k-folds", str(args.k_folds), "--batch-size", "128",
                "--image-size", "224", "--seed", "0",
                "--synthetic-dir", str(out / "synthetic")] + extra + \
                (args.clf_extra.split() if args.clf_extra else []) + \
                (["--cpu"] if args.cpu else [])
            ph = Phase(f"cv_{strategy}", cmd, out / f"cv_{strategy}.log")
            results[f"cv_{strategy}"] = ph.run()
            res_path.write_text(json.dumps(results, indent=1))

    if "single" in phases:
        # single (non-CV) runs per strategy: produce the
        # {strategy}_resnet50 checkpoints the Grad-CAM comparison loads
        # and the {strategy}_final_metrics.json files (the reference
        # protocol ran both CV and single runs — its analyzer needs the
        # single-run checkpoints, analyze_results.py:455-470)
        for strategy, extra in (
                ("baseline", []),
                ("augmented", ["--use-synthetic"]),
                ("curriculum", ["--use-synthetic", "--use-curriculum"])):
            cmd = base + ["src/train_classifier.py"] + common + [
                "--epochs", "5", "--k-folds", "1", "--batch-size", "128",
                "--image-size", "224", "--seed", "0",
                "--synthetic-dir", str(out / "synthetic")] + extra + \
                (args.clf_extra.split() if args.clf_extra else []) + \
                (["--cpu"] if args.cpu else [])
            ph = Phase(f"single_{strategy}", cmd,
                       out / f"single_{strategy}.log")
            results[f"single_{strategy}"] = ph.run()
            res_path.write_text(json.dumps(results, indent=1))

    if "unfrozen" in phases:
        cmd = base + ["src/train_classifier.py"] + common + [
            "--epochs", "2", "--k-folds", str(args.k_folds),
            "--batch-size", "128", "--image-size", "224", "--seed", "0",
            "--unfreeze", "--lr", "1e-4",
            "--synthetic-dir", str(out / "synthetic")] + \
            (args.clf_extra.split() if args.clf_extra else []) + \
            (["--cpu"] if args.cpu else [])
        # separate metrics dir: the unfrozen lane must not overwrite the
        # frozen baseline_* artifacts the analyzers consume
        cmd[cmd.index("--results-dir") + 1] = str(
            out / "results_unfrozen/metrics")
        cmd[cmd.index("--figures-dir") + 1] = str(
            out / "results_unfrozen/figures")
        cmd[cmd.index("--model-dir") + 1] = str(out / "models_unfrozen")
        ph = Phase("cv_unfrozen", cmd, out / "cv_unfrozen.log")
        results["cv_unfrozen"] = ph.run()
        res_path.write_text(json.dumps(results, indent=1))

    if "analyze" in phases:
        cmd = base + ["src/analyze_results.py",
                      "--metrics-dir", str(out / "results/metrics"),
                      "--analysis-dir", str(out / "results/analysis"),
                      "--data-dir", args.data_dir,
                      "--synthetic-dir", str(out / "synthetic"),
                      "--model-dir", str(out / "models")] + \
            (args.analyze_extra.split() if args.analyze_extra else []) + \
            (["--cpu"] if args.cpu else [])
        ph = Phase("analyze", cmd, out / "analyze.log")
        results["analyze"] = ph.run()
        res_path.write_text(json.dumps(results, indent=1))

    if "ref_analyze" in phases:
        runner = out / "_run_ref_analyzer.py"
        runner.write_text(
            "ARGV = ['analyze_results.py',"
            f" '--metrics-dir', {str(out / 'results/metrics')!r},"
            f" '--analysis-dir', {str(out / 'results/ref_analysis')!r},"
            " '--cpu', '--skip-ssim', '--skip-gradcam']\n"
            + REF_STUBS)
        ph = Phase("ref_analyze", base + [str(runner)],
                   out / "ref_analyze.log")
        r = ph.run()
        produced = sorted(os.listdir(out / "results/ref_analysis")) \
            if (out / "results/ref_analysis").exists() else []
        results["ref_analyze"] = {**r, "artifacts": produced}
        res_path.write_text(json.dumps(results, indent=1))

    print(json.dumps(results, indent=1))

    if args.record:
        bd_path = REPO / "BENCH_DETAIL.json"
        bd = json.loads(bd_path.read_text())
        bd["reference_scale_rehearsal"] = results
        bd_path.write_text(json.dumps(bd, indent=1))
        print("recorded into BENCH_DETAIL.json")


if __name__ == "__main__":
    main()
