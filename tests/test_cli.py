"""CLI flag-surface contract: every entry point must expose the reference
script's flags with the reference's defaults (SURVEY.md §5 flag inventory).
"""
import importlib.util
import os
import sys

import pytest

SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src")


def load_parser(script):
    spec = importlib.util.spec_from_file_location(
        f"cli_{script}", os.path.join(SRC, f"{script}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.build_parser()


def defaults(parser):
    return {a.dest: a.default for a in parser._actions}


def test_train_gan_flags():
    d = defaults(load_parser("train_gan"))
    # reference train_gan.py:213-249
    assert d["data_dir"] == "./data/processed"
    assert d["model_dir"] == "./models"
    assert d["output_dir"] == "./results"
    assert d["results_dir"] == "./results/metrics"
    assert d["figures_dir"] == "./results/figures"
    assert d["num_channels"] == 3
    assert d["latent_dim"] == 100
    assert d["feature_maps_g"] == 64 and d["feature_maps_d"] == 64
    assert d["epochs"] == 50 and d["batch_size"] == 128
    assert d["lr"] == 0.0002 and d["beta1"] == 0.5
    assert d["vis_batch_size"] == 64
    assert d["save_interval"] == 500 and d["checkpoint_interval"] == 10
    assert d["cpu"] is False
    assert d["image_size"] == 224  # TPU extra, reference-equivalent default


def test_train_wggan_flags():
    d = defaults(load_parser("train_wggan"))
    # reference train_wggan.py:126-155
    assert d["epochs"] == 30 and d["batch_size"] == 64
    assert d["critic_iters"] == 5 and d["lambda_gp"] == 10.0
    assert d["feature_maps_g"] == 64


def test_train_cgan_flags():
    d = defaults(load_parser("train_cgan"))
    # reference train_cgan.py:249-274
    assert d["epochs"] == 50 and d["batch_size"] == 32
    assert d["feature_maps_g"] == 32 and d["feature_maps_d"] == 32
    assert d["vis_batch_size"] == 32
    assert d["save_interval"] == 1000 and d["checkpoint_interval"] == 5


def test_train_classifier_flags():
    d = defaults(load_parser("train_classifier"))
    # reference train_classifier.py:697-747
    assert d["synthetic_dir"] == "./data/synthetic"
    assert d["epochs"] == 15 and d["batch_size"] == 32
    assert d["lr"] == 0.001
    assert d["unfreeze"] is False
    assert d["k_folds"] == 5
    assert d["use_synthetic"] is False and d["use_curriculum"] is False
    assert d["curriculum_schedule"] == "0:0.0, 5:0.25, 10:0.5"
    assert d["grad_accum"] == 1  # TPU-native extra; 1 = reference step


@pytest.mark.parametrize("script", ["train_gan", "train_wggan", "train_cgan"])
def test_gan_trainer_extension_flag_defaults(script):
    """TPU-native extension flags must default to reference behavior: a
    bare invocation trains exactly the reference loop (no EMA, one step
    per dispatch, replicated params/optimizer, local data store)."""
    d = defaults(load_parser(script))
    assert d["ema_decay"] == 0.0       # off = reference (no EMA path)
    assert d["steps_per_call"] == 1    # one program per step
    assert d["model_parallel"] == 1    # replicated wide layers
    assert d["shard_opt_state"] is False
    assert d["shard_store"] is False
    assert d["trace_dir"] == ""


@pytest.mark.parametrize("script,fm", [("generate_synthetic", 64),
                                       ("generate_synthetic_cgan", 32),
                                       ("generate_synthetic_wgan", 64)])
def test_generate_flags(script, fm):
    d = defaults(load_parser(script))
    # reference generate_synthetic*.py argparse blocks
    assert d["output_dir"] == "./data/synthetic"
    assert d["num_images"] == 5000
    assert d["latent_dim"] == 100
    assert d["feature_maps_g"] == fm
    assert d["batch_size"] == 64
    p = load_parser(script)
    with pytest.raises(SystemExit):  # --model-path is required
        p.parse_args([])


@pytest.mark.parametrize("script", [
    "generate_synthetic", "generate_synthetic_cgan", "generate_synthetic_wgan",
    "predict", "serve", "export_model"])
def test_inference_compute_dtype_flag(script):
    """Inference-only CLIs accept --compute-dtype (TPU extra: without it
    these paths ran fp32 on TPU, ~half MXU rate). 'auto' resolves per
    backend (bf16 on TPU, f32 on CPU) like the trainers' flag."""
    d = defaults(load_parser(script))
    assert d["compute_dtype"] == "auto"


def test_analyze_results_flags():
    d = defaults(load_parser("analyze_results"))
    # reference analyze_results.py:586-609
    assert d["metrics_dir"] == "./results/metrics"
    assert d["analysis_dir"] == "./results/analysis"
    assert d["num_ssim_real"] == 100 and d["num_ssim_synth"] == 500
    assert d["num_gradcam_samples"] == 3
    assert d["skip_plots"] is False and d["skip_ssim"] is False
    assert d["skip_gradcam"] is False


def test_data_loader_flags():
    d = defaults(load_parser("data_loader"))
    assert d["batch_size"] == 4 and d["k_folds"] == 3
    assert d["test_mode"] == "basic"


def test_data_loader_self_test_error_envelope(fake_dataset, monkeypatch,
                                              capsys, tmp_path):
    """The self-test CLI must finish cleanly (no uncaught traceback, like
    the reference's try/except envelope around each exercised loader,
    reference data_loader.py:775-810) when a synthetic mode points at a
    MISSING --synthetic-dir, and must run the mode for real when the dir
    exists. (The reference declares --test-mode but never consumes it;
    ours dispatches all five modes.)"""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "cli_data_loader_run", os.path.join(SRC, "data_loader.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def run(*extra):
        monkeypatch.setattr(sys, "argv", [
            "data_loader.py", "--cpu", "--data-dir", fake_dataset["data_dir"],
            "--image-size", "32", "--cache-dir", str(tmp_path / "cache"),
            *extra])
        mod.main()  # must not raise
        return capsys.readouterr().out

    out = run("--test-mode", "phased_kfold",
              "--synthetic-dir", str(tmp_path / "missing"))
    assert "Error using phased_kfold" in out
    assert "self-test finished" in out

    out = run("--test-mode", "phased_kfold",
              "--synthetic-dir", fake_dataset["synthetic_dir"])
    assert "Error using" not in out
    assert "phased batch ratio=1.0" in out
    assert "self-test finished" in out


def test_ema_decay_out_of_range_rejected():
    """--ema-decay outside [0, 1) diverges the EMA lerp, and because
    the EMA tree is write-only the damage only surfaces in the FINAL
    checkpoint hours later — the typo must die at parse time."""
    p = load_parser("train_gan")
    for bad in ("9.99", "1.0", "-0.1"):
        with pytest.raises(SystemExit):
            p.parse_args(["--ema-decay", bad])
    assert p.parse_args(["--ema-decay", "0.999"]).ema_decay == 0.999
    assert p.parse_args([]).ema_decay == 0.0
