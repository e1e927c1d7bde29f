"""predict.py CLI: classify a folder with a saved checkpoint."""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src")


def test_predict_cli(tmp_path, fake_dataset):
    from xgan.io_.checkpoint import save_variables
    from xgan.models.resnet import ResNet50

    model = ResNet50(num_classes=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    ckpt = str(tmp_path / "baseline_resnet50.msgpack")
    save_variables(ckpt, {"params": variables["params"],
                          "batch_stats": variables["batch_stats"]})

    out = str(tmp_path / "preds.json")
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "predict.py"), "--cpu",
         "--model-path", ckpt,
         "--input-dir", os.path.join(fake_dataset["data_dir"], "Test"),
         "--output", out, "--image-size", "32", "--batch-size", "4"],
        capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]

    data = json.loads(open(out).read())
    assert data["num_images"] == fake_dataset["n_test"]
    assert data["positive"] + data["negative"] == data["num_images"]
    assert len(data["predictions"]) == data["num_images"]
    p0 = data["predictions"][0]
    assert set(p0.keys()) == {"file", "label", "prob_positive"}
    assert 0.0 <= p0["prob_positive"] <= 1.0

    # Same checkpoint as a reference-layout torchvision .pth (extension-
    # detected) must produce identical predictions — the conversion is
    # pure layout transposes, no numeric change.
    torch = pytest.importorskip("torch")  # noqa: F841
    from xgan.models.pretrained import save_torch_resnet50
    pth = str(tmp_path / "baseline_resnet50.pth")
    save_torch_resnet50(pth, variables["params"], variables["batch_stats"])
    out2 = str(tmp_path / "preds_pth.json")
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "predict.py"), "--cpu",
         "--model-path", pth,
         "--input-dir", os.path.join(fake_dataset["data_dir"], "Test"),
         "--output", out2, "--image-size", "32", "--batch-size", "4"],
        capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    data2 = json.loads(open(out2).read())
    assert data2["predictions"] == data["predictions"]

    # Same model as a .stablehlo serving artifact (third accepted
    # format) — identical predictions, with --image-size overridden by
    # the artifact's own input signature.
    from xgan.io_.export import export_classifier, save_exported
    art_path = str(tmp_path / "baseline.stablehlo")
    save_exported(art_path, export_classifier(model, {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"]}, 32),
        meta={"kind": "classifier", "image_size": 32, "num_classes": 2})
    out3 = str(tmp_path / "preds_art.json")
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "predict.py"), "--cpu",
         "--model-path", art_path,
         "--input-dir", os.path.join(fake_dataset["data_dir"], "Test"),
         "--output", out3, "--image-size", "224", "--batch-size", "4"],
        capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "artifact takes 32px input" in r.stdout
    data3 = json.loads(open(out3).read())
    # the compiled artifact may differ from the live program in the last
    # float ulp (op fusion order) — labels exact, probs to 1e-5
    for a, b in zip(data3["predictions"], data["predictions"]):
        assert a["file"] == b["file"] and a["label"] == b["label"]
        assert abs(a["prob_positive"] - b["prob_positive"]) < 1e-5

    # a generator artifact is a structured error, not a shape crash
    from xgan.io_.export import export_generator
    from xgan.models.dcgan import Generator
    g = Generator(latent_dim=8, feature_maps=4, image_size=32)
    gv = g.init(jax.random.key(1), jnp.zeros((1, 8)), train=False)
    gen_path = str(tmp_path / "gen.stablehlo")
    save_exported(gen_path, export_generator(
        g, {"params": gv["params"], "batch_stats": gv["batch_stats"]}, 8))
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "predict.py"), "--cpu",
         "--model-path", gen_path,
         "--input-dir", os.path.join(fake_dataset["data_dir"], "Test"),
         "--output", out3, "--image-size", "32"],
        capture_output=True, text=True, timeout=500)
    assert r.returncode == 1
    assert "not a classifier artifact" in r.stdout
    assert "Traceback" not in r.stderr


def test_predict_cli_empty_dir(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    dummy_model = tmp_path / "dummy.msgpack"
    dummy_model.write_bytes(b"")

    # missing model path: clean fail-fast message, no traceback
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "predict.py"), "--cpu",
         "--model-path", "whatever.msgpack", "--input-dir", str(empty)],
        capture_output=True, text=True, timeout=200)
    assert r.returncode == 1
    assert "Error: model checkpoint not found" in r.stdout
    assert "Traceback" not in r.stderr

    # empty input dir (model path exists and is checked first)
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "predict.py"), "--cpu",
         "--model-path", str(dummy_model), "--input-dir", str(empty)],
        capture_output=True, text=True, timeout=200)
    assert r.returncode == 1
    assert "No PNGs found" in r.stdout
