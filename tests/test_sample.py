"""Sampler tests: checkpoint round-trip, PNG output, conditional path,
export-transform correctness."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xgan.data.pipeline import tanh_to_u8


def test_tanh_to_u8_transform():
    # the reference's export transform x*0.5+0.5 (generate_synthetic.py:53)
    x = jnp.asarray([[-1.0, 0.0, 1.0, 2.0, -2.0]])
    out = np.asarray(tanh_to_u8(x))
    np.testing.assert_array_equal(out, [[0, 128, 255, 255, 0]])


def test_generate_images_from_checkpoint(tmp_path):
    from xgan.io_.checkpoint import save_variables
    from xgan.models import dcgan
    from xgan.train.sample import generate_images, load_generator

    model = dcgan.Generator(latent_dim=8, feature_maps=4, image_size=32)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 8)),
                           train=False)
    ckpt = str(tmp_path / "generator_final.msgpack")
    save_variables(ckpt, {"params": variables["params"],
                          "batch_stats": variables["batch_stats"]})

    loaded = load_variables_roundtrip = load_generator(
        model, ckpt, (jnp.zeros((2, 8)),))
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(loaded["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_dir = str(tmp_path / "synthetic")
    n = generate_images(model, loaded, output_dir=out_dir, num_images=10,
                        latent_dim=8, batch_size=4, seed=0)
    assert n == 10
    files = sorted(glob.glob(os.path.join(out_dir, "synthetic_*.png")))
    assert len(files) == 10
    assert files[0].endswith("synthetic_00001.png")
    from PIL import Image
    im = Image.open(files[0])
    assert im.size == (32, 32) and im.mode == "RGB"


def test_generate_conditional(tmp_path):
    from xgan.models import cgan
    from xgan.train.sample import generate_images

    model = cgan.Generator(latent_dim=8, feature_maps=8, image_size=32)
    variables = model.init(jax.random.key(0), jnp.zeros((2, 8)),
                           jnp.zeros((2,), jnp.int32), train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    out_dir = str(tmp_path / "synth_cgan")
    n = generate_images(model, variables, output_dir=out_dir, num_images=6,
                        latent_dim=8, batch_size=4, seed=0,
                        conditional=True, num_classes=2)
    assert n == 6
    assert len(glob.glob(os.path.join(out_dir, "*.png"))) == 6


def test_generate_images_bf16_compute(tmp_path):
    """The samplers' --compute-dtype bf16 path: an f32 checkpoint loads
    into a bf16-compute Generator unchanged (flax `dtype` is compute-only;
    params stay f32) and renders images close to the f32 render."""
    from xgan.io_.checkpoint import save_variables
    from xgan.models import dcgan
    from xgan.train.sample import generate_images, load_generator

    f32 = dcgan.Generator(latent_dim=8, feature_maps=4, image_size=32)
    variables = f32.init(jax.random.key(0), jnp.zeros((2, 8)), train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    ckpt = str(tmp_path / "generator_final.msgpack")
    save_variables(ckpt, variables)

    bf16 = dcgan.Generator(latent_dim=8, feature_maps=4, image_size=32,
                           dtype=jnp.bfloat16)
    loaded = load_generator(bf16, ckpt, (jnp.zeros((2, 8)),))
    assert all(a.dtype == jnp.float32
               for a in jax.tree_util.tree_leaves(loaded["params"]))

    out32, out16 = str(tmp_path / "f32"), str(tmp_path / "bf16")
    for model, vs, out in ((f32, variables, out32), (bf16, loaded, out16)):
        n = generate_images(model, vs, output_dir=out, num_images=4,
                            latent_dim=8, batch_size=4, seed=0)
        assert n == 4
    from PIL import Image
    for i in range(1, 5):
        name = f"synthetic_{i:05d}.png"
        a = np.asarray(Image.open(os.path.join(out32, name)), np.int16)
        b = np.asarray(Image.open(os.path.join(out16, name)), np.int16)
        # bf16 has ~2^-8 relative precision; through 3 conv/BN layers the
        # u8 render stays within a few levels of the f32 one
        assert np.abs(a - b).mean() < 4.0
        assert np.abs(a - b).max() <= 32


def test_missing_checkpoint_exits(tmp_path):
    from xgan.models import dcgan
    from xgan.train.sample import load_generator
    model = dcgan.Generator(latent_dim=8, feature_maps=4, image_size=32)
    with pytest.raises(SystemExit):
        load_generator(model, str(tmp_path / "nope.msgpack"),
                       (jnp.zeros((2, 8)),))


def test_sampler_cli_from_artifact(tmp_path):
    """The sampler CLIs accept .stablehlo generator artifacts: PNGs are
    produced with latent_dim read from the artifact signature, and the
    conditional sampler rejects an unconditional artifact with a
    structured error."""
    import subprocess
    import sys

    from xgan.io_.export import export_generator, save_exported
    from xgan.models import dcgan

    SRC = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "src")
    model = dcgan.Generator(latent_dim=8, feature_maps=4, image_size=32)
    v = model.init(jax.random.key(0), jnp.zeros((2, 8)), train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    art_path = str(tmp_path / "gen.stablehlo")
    save_exported(art_path, export_generator(model, v, 8))

    out_dir = str(tmp_path / "synth_art")
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "generate_synthetic.py"),
         "--cpu", "--model-path", art_path, "--output-dir", out_dir,
         "--num-images", "6", "--batch-size", "4",
         "--latent-dim", "999"],  # ignored: the artifact knows its latent
        capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    files = sorted(glob.glob(os.path.join(out_dir, "synthetic_*.png")))
    assert len(files) == 6

    # conditionality mismatch -> structured error, exit 1
    r = subprocess.run(
        [sys.executable, os.path.join(SRC, "generate_synthetic_cgan.py"),
         "--cpu", "--model-path", art_path,
         "--output-dir", str(tmp_path / "x")],
        capture_output=True, text=True, timeout=500)
    assert r.returncode == 1
    assert "conditional generator artifact" in r.stdout
    assert "Traceback" not in r.stderr
