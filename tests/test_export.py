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


def test_quantize_dequantize_bounds_and_selectivity():
    """xgan.io_.quant unit contracts: per-output-channel int8 round-trip
    error is bounded by scale/2 per element, only >=2-D 'kernel' leaves
    quantize (BN scale/bias, biases untouched), and dequantize_params is
    the identity on full-precision trees."""
    from xgan.io_.quant import (dequantize_params, is_quantized,
                                quantize_params)

    rng = np.random.default_rng(0)
    params = {
        # per-output-channel magnitudes spanning 100x, to exercise the
        # per-channel (not per-tensor) scale choice
        "Conv_0": {"kernel": (rng.normal(size=(3, 3, 4, 8)) *
                              rng.uniform(0.1, 10, 8)).astype(np.float32),
                   "bias": rng.normal(size=(8,)).astype(np.float32)},
        "BatchNorm_0": {"scale": np.ones(8, np.float32),
                        "bias": np.zeros(8, np.float32)},
        "Dense_0": {"kernel": rng.normal(size=(8, 2)).astype(np.float32)},
    }
    assert not is_quantized(params)
    q = quantize_params(params)
    assert is_quantized(q)
    assert set(q["Conv_0"]["kernel"].keys()) == {"q8", "q8_scale"}
    assert q["Conv_0"]["kernel"]["q8"].dtype == jnp.int8
    # untouched leaves pass through by identity
    assert q["BatchNorm_0"]["scale"] is params["BatchNorm_0"]["scale"]
    assert q["Conv_0"]["bias"] is params["Conv_0"]["bias"]

    dq = dequantize_params(q)
    for name in ("Conv_0", "Dense_0"):
        w = params[name]["kernel"]
        s = np.abs(w).max(axis=tuple(range(w.ndim - 1))) / 127.0
        err = np.abs(np.asarray(dq[name]["kernel"]) - w)
        assert (err <= s / 2 + 1e-7).all(), (name, float(err.max()))
    # identity on an unquantized tree
    dq_plain = dequantize_params(params)
    assert dq_plain["Conv_0"]["kernel"] is params["Conv_0"]["kernel"]


def test_quantized_classifier_artifact(tmp_path):
    """int8 weight-only export: the artifact bakes INT8 constants (size
    < 0.45x the f32 export — the guard that dequantization stayed inside
    the trace; eager dequant measured zero shrink), matches the live
    dequantized model tightly, and drifts from full precision only
    within the expected quantization noise."""
    from xgan.data.pipeline import normalize_images
    from xgan.io_.export import (export_classifier, load_exported,
                                 save_exported)
    from xgan.io_.quant import dequantize_params, quantize_params
    from xgan.models.resnet import ResNet50

    model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))
    v = model.init(jax.random.key(4), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    vq = dict(v, params=quantize_params(v["params"]))

    p_f32 = str(tmp_path / "clf.stablehlo")
    p_q = str(tmp_path / "clf_q.stablehlo")
    save_exported(p_f32, export_classifier(model, v, 32))
    save_exported(p_q, export_classifier(model, vq, 32))
    assert os.path.getsize(p_q) < 0.45 * os.path.getsize(p_f32)

    x = np.random.default_rng(5).integers(0, 255, (4, 32, 32, 3), np.uint8)
    # exact contract: artifact == live model with the same int8 weights
    v_dq = dict(v, params=dequantize_params(vq["params"]))
    logits = model.apply(v_dq, normalize_images(jnp.asarray(x)),
                         train=False)
    want_probs = np.asarray(
        jax.nn.softmax(logits.astype(jnp.float32), -1)[:, 1])
    labels, probs = load_exported(p_q).call(x)
    np.testing.assert_array_equal(np.asarray(labels),
                                  np.asarray(jnp.argmax(logits, -1)))
    np.testing.assert_allclose(np.asarray(probs), want_probs, atol=1e-5)
    # drift contract vs full precision (random-init logits are near-tie,
    # so this is a loose sanity band, not an accuracy claim)
    _, probs_f32 = load_exported(p_f32).call(x)
    assert np.abs(np.asarray(probs) - np.asarray(probs_f32)).max() < 0.25


def test_quantized_generator_artifact_cli(tmp_path):
    """Real CLI with --quantize int8: export verifies against the live
    (quantized) model, the envelope records the quantization, the
    artifact shrinks, and renders stay within a few u8 levels of the
    full-precision artifact."""
    from xgan.io_.checkpoint import save_variables
    from xgan.io_.export import load_exported_with_meta
    from xgan.models.dcgan import Generator

    model = Generator(latent_dim=16, feature_maps=8, image_size=32)
    v = model.init(jax.random.key(8), jnp.zeros((1, 16)), train=False)
    ckpt = str(tmp_path / "generator_final.msgpack")
    save_variables(ckpt, {"params": v["params"],
                          "batch_stats": v["batch_stats"]})

    outs = {}
    for q in ("none", "int8"):
        out = str(tmp_path / f"gen_{q}.stablehlo")
        r = subprocess.run(
            [sys.executable, os.path.join(SRC, "export_model.py"), "--cpu",
             "--kind", "gan", "--model-path", ckpt, "--output", out,
             "--latent-dim", "16", "--feature-maps-g", "8",
             "--image-size", "32", "--quantize", q],
            capture_output=True, text=True, timeout=500)
        assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
        assert "Verified: artifact output matches the live model." in r.stdout
        outs[q] = out
    assert os.path.getsize(outs["int8"]) < 0.5 * os.path.getsize(outs["none"])

    art_q, meta = load_exported_with_meta(outs["int8"])
    assert meta["quantize"] == "int8"
    _, meta_f = load_exported_with_meta(outs["none"])
    assert "quantize" not in meta_f

    z = np.random.default_rng(6).normal(size=(3, 16)).astype(np.float32)
    got_q = np.asarray(art_q.call(z), np.int16)
    got_f = np.asarray(load_exported_with_meta(outs["none"])[0].call(z),
                       np.int16)
    assert got_q.shape == (3, 32, 32, 3)
    assert np.abs(got_q - got_f).max() <= 3
