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


def test_async_save_matches_sync_bytes(tmp_path):
    """async_io must change WHEN the file is written, not what's in it:
    after flush() the async snapshot is byte-identical to a sync save
    of the same states (the donated-buffer device copy and the worker
    thread are pure plumbing)."""
    states = {"g": _state(1.5), "d": _state(-2.0)}
    sync_path = str(tmp_path / "sync.msgpack")
    SnapshotManager(sync_path).save(states, epoch=7, iters=123)

    async_path = str(tmp_path / "async.msgpack")
    mgr = SnapshotManager(async_path, async_io=True)
    mgr.save(states, epoch=7, iters=123)
    mgr.flush()
    assert open(async_path, "rb").read() == open(sync_path, "rb").read()

    # resume reads it like any other snapshot
    out, epoch, iters = mgr.try_resume("auto", {"g": _state(0.0),
                                               "d": _state(0.0)})
    assert (epoch, iters) == (7, 123)


def test_async_fifo_last_save_wins_and_state_mutation_safe(tmp_path):
    """Back-to-back async saves land in order (single FIFO worker) and
    each save pins ITS OWN copy of the state — later donation/mutation
    of the live buffers must not corrupt an in-flight save. save_file
    and save_json ride the same queue."""
    path = str(tmp_path / "snap.msgpack")
    mgr = SnapshotManager(path, async_io=True)
    s1 = {"g": _state(1.0)}
    mgr.save(s1, epoch=1, iters=10)
    # simulate donation: delete the live buffers right after enqueue
    jax.tree_util.tree_map(lambda x: x.delete(), s1["g"].params)
    mgr.save({"g": _state(2.0)}, epoch=2, iters=20)
    mgr.save_file(str(tmp_path / "vars.msgpack"),
                  {"params": {"w": jnp.ones((2,))}})
    history = {"loss": [1.0]}
    mgr.save_json(str(tmp_path / "hist.json"), history)
    history["loss"].append(2.0)  # mutation after enqueue must not leak
    mgr.flush()

    out, epoch, iters = mgr.try_resume("auto", {"g": _state(0.0)})
    assert (epoch, iters) == (2, 20)
    np.testing.assert_array_equal(np.asarray(out["g"].params["w"]),
                                  np.full((3, 3), 2.0))
    import json
    assert json.load(open(tmp_path / "hist.json")) == {"loss": [1.0]}
    assert (tmp_path / "vars.msgpack").exists()


def test_async_write_failure_raises_on_flush(tmp_path):
    """A failed background write must not be silent: flush() re-raises
    the worker's exception (the run would otherwise report snapshots it
    never persisted)."""
    import pytest

    # target path IS a directory: the atomic rename must fail
    # (save_variables auto-creates missing parents, so a bad parent
    # dir would not error)
    (tmp_path / "snap.msgpack").mkdir()
    mgr = SnapshotManager(str(tmp_path / "snap.msgpack"),
                          async_io=True)
    mgr.save({"g": _state(1.0)}, epoch=1, iters=1)
    with pytest.raises(Exception):
        mgr.flush()
    # the error is consumed: a second flush is clean
    mgr.flush()


def test_analyzer_excludes_historyless_run(tmp_path):
    """A run with only final_metrics and no history is excluded, matching
    the reference's essential_missing behavior
    (analyze_results.py:123-140)."""
    import json
    from xgan.analysis import load_metrics
    (tmp_path / "baseline_final_metrics.json").write_text(
        json.dumps({"config": {}, "metrics": {"accuracy": 0.9}}))
    assert load_metrics(str(tmp_path), "baseline_") is None


def test_async_write_failure_raises_on_next_save(tmp_path):
    """A failed background write surfaces at the NEXT save, not hours
    later at the loop-end flush: a run whose checkpoint dir went bad at
    epoch 1 must stop reporting 'Saved checkpoints' for epochs 2..N."""
    import pytest

    (tmp_path / "snap.msgpack").mkdir()  # rename onto a dir fails
    mgr = SnapshotManager(str(tmp_path / "snap.msgpack"), async_io=True)
    mgr.save({"g": _state(1.0)}, epoch=1, iters=1)
    mgr._writer._queue.join()  # let the worker hit the failure
    with pytest.raises(Exception):
        mgr.save({"g": _state(2.0)}, epoch=2, iters=2)
    mgr.flush()  # error was consumed by the raise: flush is clean
