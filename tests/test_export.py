"""StableHLO serving-artifact export (xgan/io_/export.py +
src/export_model.py): batch-polymorphic, weights baked in, output parity
with the live model, CLI envelope."""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src")


def test_classifier_artifact_matches_live_model(tmp_path):
    from xgan.data.pipeline import normalize_images
    from xgan.io_.export import (export_classifier, load_exported,
                                 save_exported)
    from xgan.models.resnet import ResNet50

    model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))
    v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    path = str(tmp_path / "clf.stablehlo")
    save_exported(path, export_classifier(model, v, 32))
    art = load_exported(path)

    x = np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3), np.uint8)
    logits = model.apply(v, normalize_images(jnp.asarray(x)), train=False)
    want_labels = np.asarray(jnp.argmax(logits, -1))
    want_probs = np.asarray(
        jax.nn.softmax(logits.astype(jnp.float32), -1)[:, 1])

    labels, probs = art.call(x)
    np.testing.assert_array_equal(np.asarray(labels), want_labels)
    np.testing.assert_allclose(np.asarray(probs), want_probs, atol=1e-6)

    # symbolic batch: the SAME artifact serves a different batch size
    labels7, _ = art.call(np.repeat(x, 2, axis=0)[:7])
    assert np.asarray(labels7).shape == (7,)


@pytest.mark.parametrize("kind", ["dcgan", "wgan", "cgan"])
def test_generator_artifact_matches_live_model(tmp_path, kind):
    from xgan.data.pipeline import tanh_to_u8
    from xgan.io_.export import (export_generator, load_exported,
                                 save_exported)
    if kind == "dcgan":
        from xgan.models.dcgan import Generator
    elif kind == "wgan":
        from xgan.models.wgan import Generator
    else:
        from xgan.models.cgan import Generator

    conditional = kind == "cgan"
    model = Generator(latent_dim=16, feature_maps=8, image_size=32)
    example = (jnp.zeros((1, 16)),)
    if conditional:
        example = example + (jnp.zeros((1,), jnp.int32),)
    v = model.init(jax.random.key(1), *example, train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}

    path = str(tmp_path / f"{kind}.stablehlo")
    save_exported(path, export_generator(model, v, 16,
                                         conditional=conditional))
    art = load_exported(path)

    rng = np.random.default_rng(2)
    z = rng.normal(size=(3, 16)).astype(np.float32)
    if conditional:
        labels = rng.integers(0, 2, (3,), np.int32)
        want = tanh_to_u8(model.apply(v, jnp.asarray(z),
                                      jnp.asarray(labels), train=False))
        got = art.call(z, labels)
    else:
        want = tanh_to_u8(model.apply(v, jnp.asarray(z), train=False))
        got = art.call(z)
    assert np.asarray(got).dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("dtype_flag", ["auto", "bf16"])
def test_export_cli_roundtrip(tmp_path, dtype_flag):
    """Real CLI: train-free DCGAN checkpoint -> artifact, with the
    built-in reload-verify step (both the f32 bitwise and the bf16
    ±1-u8-level verify branches); then the fail-fast envelope."""
    from xgan.io_.checkpoint import save_variables
    from xgan.models.dcgan import Generator

    model = Generator(latent_dim=16, feature_maps=8, image_size=32)
    v = model.init(jax.random.key(3), jnp.zeros((1, 16)), train=False)
    ckpt = str(tmp_path / "generator_final.msgpack")
    save_variables(ckpt, {"params": v["params"],
                          "batch_stats": v["batch_stats"]})

    out = str(tmp_path / "gen.stablehlo")
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "export_model.py"), "--cpu",
         "--kind", "gan", "--model-path", ckpt, "--output", out,
         "--latent-dim", "16", "--feature-maps-g", "8",
         "--image-size", "32", "--compute-dtype", dtype_flag],
        capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Verified: artifact output matches the live model." in r.stdout
    assert os.path.exists(out)

    # fail-fast: missing checkpoint -> structured error, no traceback
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "export_model.py"), "--cpu",
         "--kind", "gan", "--model-path", str(tmp_path / "nope.msgpack"),
         "--output", out, "--latent-dim", "16"],
        capture_output=True, text=True, timeout=200)
    assert r.returncode == 1
    assert "Error" in r.stdout
    assert "Traceback" not in r.stderr


def test_export_cli_cgan_num_classes(tmp_path):
    """--num-classes reaches the CGAN Generator: a 3-class conditional
    checkpoint exports (previously the model was always built 2-class
    and the shape check rejected it with no flag that could fix it)."""
    from xgan.io_.checkpoint import save_variables
    from xgan.models.cgan import Generator

    model = Generator(latent_dim=16, feature_maps=8, image_size=32,
                      num_classes=3)
    v = model.init(jax.random.key(6), jnp.zeros((1, 16)),
                   jnp.zeros((1,), jnp.int32), train=False)
    ckpt = str(tmp_path / "generator_final.msgpack")
    save_variables(ckpt, {"params": v["params"],
                          "batch_stats": v["batch_stats"]})

    out = str(tmp_path / "cgen3.stablehlo")
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "export_model.py"), "--cpu",
         "--kind", "cgan", "--model-path", ckpt, "--output", out,
         "--latent-dim", "16", "--feature-maps-g", "8",
         "--image-size", "32", "--num-classes", "3"],
        capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "Verified: artifact output matches the live model." in r.stdout


def test_artifact_envelope_roundtrip_and_back_compat(tmp_path):
    """The self-description envelope: meta round-trips, the Exported
    still loads and runs, and pre-envelope raw blobs load with meta
    None."""
    from xgan.io_.export import (export_generator, load_exported,
                                 load_exported_with_meta, save_exported)
    from xgan.models.dcgan import Generator

    model = Generator(latent_dim=16, feature_maps=8, image_size=32)
    v = model.init(jax.random.key(9), jnp.zeros((1, 16)), train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    blob = export_generator(model, v, 16)

    meta_in = {"kind": "gan", "latent_dim": 16, "conditional": False}
    enveloped = str(tmp_path / "env.stablehlo")
    save_exported(enveloped, blob, meta=meta_in)
    art, meta = load_exported_with_meta(enveloped)
    assert meta == meta_in
    z = np.zeros((2, 16), np.float32)
    assert np.asarray(art.call(z)).shape == (2, 32, 32, 3)
    # plain load_exported ignores the envelope transparently
    assert np.asarray(load_exported(enveloped).call(z)).shape[0] == 2

    raw = str(tmp_path / "raw.stablehlo")
    save_exported(raw, blob)  # no meta: the pre-envelope format
    art2, meta2 = load_exported_with_meta(raw)
    assert meta2 is None
    assert np.asarray(art2.call(z)).shape == (2, 32, 32, 3)
