"""Fail-fast contracts for explicit-path user errors.

The reference's failure handling is try/except + early return with a
printed message (reference train_classifier.py:597-604,
generate_synthetic.py:26-32). For flags the reference does not have
(--resume-from, --pretrained-path, --vgg-path are TPU-native extras),
the same principle applies with fail-FAST semantics: a typo'd explicit
path must abort before any compile/decode work, never silently restart
or train from random init.
"""
from tests.test_fold_resume import _args as _clf_args
from tests.test_gan_training import _gan_args


def test_gan_explicit_missing_resume_fails_fast(fake_dataset, tmp_path,
                                                capsys):
    from xgan.train.gan_loop import train_dcgan
    args = _gan_args(fake_dataset, tmp_path,
                     resume_from=str(tmp_path / "typo.msgpack"))
    assert train_dcgan(args) is None
    out = capsys.readouterr().out
    assert "Error: snapshot" in out and "typo.msgpack" in out


def test_classifier_missing_pretrained_fails_fast(fake_dataset, tmp_path,
                                                  capsys):
    from xgan.train.classifier_loop import train_classifier
    args = _clf_args(fake_dataset, tmp_path,
                     pretrained_path=str(tmp_path / "typo.pth"))
    assert train_classifier(args) is None
    out = capsys.readouterr().out
    assert "Error: pretrained checkpoint" in out


def test_classifier_rejects_non_auto_resume(fake_dataset, tmp_path, capsys):
    from xgan.train.classifier_loop import train_classifier
    args = _clf_args(fake_dataset, tmp_path,
                     resume_from=str(tmp_path / "snap.msgpack"))
    assert train_classifier(args) is None
    out = capsys.readouterr().out
    assert "only --resume-from auto" in out


def test_cgan_missing_vgg_fails_fast(fake_dataset, tmp_path, capsys):
    from xgan.train.cgan_loop import train_cgan
    args = _gan_args(fake_dataset, tmp_path,
                     vgg_path=str(tmp_path / "typo_vgg.pth"))
    assert train_cgan(args) is None
    out = capsys.readouterr().out
    assert "Error: VGG16 checkpoint" in out


def test_sampler_mismatched_msgpack_fails_with_message(tmp_path, capsys):
    """A checkpoint saved with different model flags must fail the
    sampler's load with the clear 'Ensure the model flags ... match
    training' message (the reference's state-dict analog,
    generate_synthetic.py:28-32), not an opaque ScopeParamShapeError at
    apply time — flax deserialization restores mismatched shapes without
    complaint."""
    import jax
    import jax.numpy as jnp
    import pytest

    from xgan.io_.checkpoint import save_variables
    from xgan.models import dcgan
    from xgan.train.sample import load_generator

    small = dcgan.Generator(latent_dim=16, feature_maps=8, image_size=32)
    vs = small.init(jax.random.key(0), jnp.zeros((2, 16)), train=False)
    path = str(tmp_path / "gen.msgpack")
    save_variables(path, {"params": vs["params"],
                          "batch_stats": vs["batch_stats"]})

    big = dcgan.Generator(latent_dim=16, feature_maps=16, image_size=32)
    with pytest.raises(SystemExit):
        load_generator(big, path, (jnp.zeros((2, 16)),))
    out = capsys.readouterr().out
    assert "checkpoint shape" in out
    assert "match training" in out


def test_resume_auto_with_changed_flags_fails_with_message(fake_dataset,
                                                           tmp_path,
                                                           capsys):
    """--resume-from auto after changing model flags must fail with the
    shape-mismatch message, not an opaque ScopeParamShapeError at step
    time (flax deserialization restores mismatched snapshots without
    complaint)."""
    from xgan.train.gan_loop import train_dcgan

    args = _gan_args(fake_dataset, tmp_path, epochs=1)
    assert train_dcgan(args) is not None
    capsys.readouterr()

    args2 = _gan_args(fake_dataset, tmp_path, epochs=2, feature_maps_g=16,
                      resume_from="auto")
    assert train_dcgan(args2) is None
    out = capsys.readouterr().out
    assert "does not match the current model flags" in out


def test_classifier_fold_resume_mismatch_fails_with_message(fake_dataset,
                                                            tmp_path,
                                                            capsys):
    """A fold checkpoint written under different --resnet-stages must
    abort the resumed CV run with a clear message — NOT silently retrain
    the fold (the silent-restart trap) or crash later in evaluation."""
    from xgan.train.classifier_loop import train_classifier

    args = _clf_args(fake_dataset, tmp_path)
    assert train_classifier(args) is not None
    capsys.readouterr()

    args2 = _clf_args(fake_dataset, tmp_path, resume_from="auto",
                      resnet_stages=(1, 1, 2, 1))
    assert train_classifier(args2) is None
    captured = capsys.readouterr()
    # A deeper-stage mismatch is a STRUCTURE mismatch, so flax's own
    # ValueError ("dict keys do not match") fires inside load_variables
    # before the leaf shape check; either way the contract is a printed
    # Error + early return, never a traceback or a silent fold retrain.
    assert "Error:" in captured.out
    assert "do not match" in captured.out
    assert "Traceback" not in captured.err


def test_classifier_non_cv_auto_resume_prints_notice(fake_dataset,
                                                     tmp_path, capsys):
    """--resume-from auto on a single (non-CV) run is not silently a
    no-op: the loop prints that no resume mechanism applies."""
    from xgan.train.classifier_loop import train_classifier

    args = _clf_args(fake_dataset, tmp_path, k_folds=1,
                     resume_from="auto")
    assert train_classifier(args) is not None
    out = capsys.readouterr().out
    assert "has no effect on single (non-CV) classifier runs" in out
