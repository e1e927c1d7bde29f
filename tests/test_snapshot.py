"""SnapshotManager: full-state round-trip and resume semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from xgan.train.common import ModelState, adam
from xgan.train.snapshot import SnapshotManager


def _state(value):
    params = {"w": jnp.full((3, 3), value), "b": jnp.full((3,), value)}
    tx = adam(1e-3, 0.9)
    opt = tx.init(params)
    return ModelState(params=params, batch_stats={"m": jnp.zeros((3,))},
                      opt_state=opt)


def test_save_resume_roundtrip(tmp_path):
    path = str(tmp_path / "snap.msgpack")
    mgr = SnapshotManager(path)
    states = {"g": _state(1.5), "d": _state(-2.0)}
    mgr.save(states, epoch=7, iters=123)

    fresh = {"g": _state(0.0), "d": _state(0.0)}
    out, epoch, iters = mgr.try_resume("auto", fresh)
    assert (epoch, iters) == (7, 123)
    np.testing.assert_array_equal(np.asarray(out["g"].params["w"]),
                                  np.full((3, 3), 1.5))
    np.testing.assert_array_equal(np.asarray(out["d"].params["b"]),
                                  np.full((3,), -2.0))
    # optimizer state restored structurally (adam mu/nu + count)
    assert jax.tree_util.tree_structure(out["g"].opt_state) == \
        jax.tree_util.tree_structure(fresh["g"].opt_state)


def test_resume_missing_starts_fresh(tmp_path):
    """'auto' with no snapshot starts fresh; an EXPLICIT missing path is
    a user error and must fail fast (a typo'd --resume-from would
    otherwise silently restart the run it was asked to continue)."""
    import pytest

    mgr = SnapshotManager(str(tmp_path / "none.msgpack"))
    states = {"g": _state(3.0)}
    out, epoch, iters = mgr.try_resume("auto", states)
    assert (epoch, iters) == (0, 0)
    assert out is states

    with pytest.raises(FileNotFoundError):
        mgr.try_resume(str(tmp_path / "gone.msgpack"), states)


def test_analyzer_excludes_historyless_run(tmp_path):
    """A run with only final_metrics and no history is excluded, matching
    the reference's essential_missing behavior
    (analyze_results.py:123-140)."""
    import json
    from xgan.analysis import load_metrics
    (tmp_path / "baseline_final_metrics.json").write_text(
        json.dumps({"config": {}, "metrics": {"accuracy": 0.9}}))
    assert load_metrics(str(tmp_path), "baseline_") is None
