"""Execute the multi-process (emulated multi-host) path for real
(VERDICT r3 next #2): 2 processes x 4 virtual CPU devices joined by
``jax.distributed.initialize`` into one 8-device mesh, running
tests/multiproc_worker.py — DeviceStore's
``make_array_from_process_local_data`` assembly, the --shard-store
cross-process sharded store (exact u8 row recovery through the
one-owner psum gather spanning both processes), one DP DCGAN step
(cross-process grad all-reduce + sync-BN), and a process-0 snapshot
roundtrip. The same
worker runs single-process for the reference numbers, so 2-proc ==
1-proc is an apples-to-apples comparison of the identical code.

Skips (not fails) if the distributed CPU runtime cannot start in this
environment — the point is that the branch executes somewhere, bounded.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from flax import serialization

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(nproc, outdir, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=" + (
        "4" if nproc > 1 else "8")
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port), outdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(nproc)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


@pytest.mark.slow
def test_two_process_dp_equals_single_process(tmp_path):
    single = _run(1, str(tmp_path))
    assert single[0][0] == 0, single[0][2][-2000:]

    multi = _run(2, str(tmp_path))
    if any(rc != 0 for rc, _, _ in multi):
        blob = "\n".join(err[-1500:] for _, _, err in multi)
        if ("distributed" in blob.lower() or "coordinat" in blob.lower()
                or "DEADLINE" in blob or "UNAVAILABLE" in blob):
            pytest.skip(f"distributed CPU runtime unavailable: {blob[:300]}")
        raise AssertionError(blob)

    def result(outs):
        for rc, out, _ in outs:
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    return json.loads(line[len("RESULT "):])
        raise AssertionError([o[1][-500:] for o in outs])

    m1, m2 = result(single), result(multi)
    # DP equality across the process boundary: same metrics...
    np.testing.assert_allclose(m2["metrics"], m1["metrics"],
                               rtol=1e-4, atol=1e-5)
    # ...and identical post-step generator params (process-0 snapshots)
    with open(tmp_path / "params_nproc1.msgpack", "rb") as f:
        p1 = serialization.msgpack_restore(f.read())
    with open(tmp_path / "params_nproc2.msgpack", "rb") as f:
        p2 = serialization.msgpack_restore(f.read())
    import jax
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    assert len(l1) == len(l2) and len(l1) > 0
    for a, b in zip(l1, l2):
        # post-Adam comparison: cross-process reduction-order noise
        # (~1e-7) flips near-zero-gradient coordinates by up to ±lr
        # (2e-4) through Adam's g/|g| normalization — the standard
        # envelope for post-update params in this repo (CLAUDE.md r3f)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2.5e-4)

    # --- TP + ZeRO-1 lane (r5): cross-process sharded-parameter step
    # == single-process. Pre-update per-sample losses near-strict; the
    # post-Adam fc params carry the lr=1e-3 envelope.
    np.testing.assert_allclose(m2["clf_losses"], m1["clf_losses"],
                               rtol=1e-4, atol=1e-5)
    with open(tmp_path / "clf_fc_nproc1.msgpack", "rb") as f:
        fc1 = serialization.msgpack_restore(f.read())
    with open(tmp_path / "clf_fc_nproc2.msgpack", "rb") as f:
        fc2 = serialization.msgpack_restore(f.read())
    for a, b in zip(jax.tree_util.tree_leaves(fc1),
                    jax.tree_util.tree_leaves(fc2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2.5e-3)
