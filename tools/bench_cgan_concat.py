#!/usr/bin/env python
"""A/B the full CGAN fused train step with the concatenated fake+real
VGG perceptual forward (XGAN_VGG_CONCAT=1) vs the default split path —
the step-level arbiter VERDICT r3 (next #3) asked for. Also benches a
b64 entry in the same session: the reference default b32
(train_cgan.py:261) is small for a v5e and CGAN is the repo's MXU floor
(32%, docs/MXU_NOTES.md).

Subprocess-per-variant like bench_phase_ab.py: the env opt-in is read at
trace time, so each variant must trace in a fresh process.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import json, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/tools")
import jax, jax.numpy as jnp
from bench_all import bench_cgan
from xgan.parallel import create_mesh
mesh = create_mesh()
out = {{}}
for size, batch in [(224, 32), (224, 64)]:
    out[f"cgan_{{size}}px_b{{batch}}"] = bench_cgan(mesh, jnp.bfloat16,
                                                    size, batch)
print("RESULT " + json.dumps(out))
"""


def run(concat: bool):
    env = dict(os.environ)
    if concat:
        env["XGAN_VGG_CONCAT"] = "1"
    else:
        env.pop("XGAN_VGG_CONCAT", None)
    r = subprocess.run([sys.executable, "-c",
                        SCRIPT.format(repo=REPO)],
                       env=env, capture_output=True, text=True,
                       timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError((r.stdout[-2000:], r.stderr[-2000:]))


if __name__ == "__main__":
    base = run(concat=False)
    print(json.dumps({"variant": "split (default)", **base}), flush=True)
    cc = run(concat=True)
    print(json.dumps({"variant": "concat", **cc}), flush=True)
    for k in base:
        print(f"{k}: split {base[k]['sec_per_step']*1e3:.2f} ms"
              f" vs concat {cc[k]['sec_per_step']*1e3:.2f} ms"
              f" -> {base[k]['sec_per_step']/cc[k]['sec_per_step']:.3f}x",
              flush=True)
