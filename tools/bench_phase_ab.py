#!/usr/bin/env python
"""A/B the full DCGAN fused train step with the phase conv lowerings on
(XGAN_PHASE=1, the r2 opt-in) vs off (the default dilated path) — the
step-level arbiter for xgan/ops/conv.py's stride-2 lowerings, since
op-level microbenchmarks proved unreliable on this remote backend
(dispatch dedup, loop-invariant hoisting). The legacy XGAN_NO_PHASE var
is stripped from both runs; only XGAN_PHASE selects the variant."""
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
from bench_all import bench_dcgan
from xgan.parallel import create_mesh
mesh = create_mesh()
out = {{}}
for size, batch in [(224, 128), (64, 128)]:
    out[f"dcgan_{{size}}px_b{{batch}}"] = bench_dcgan(mesh, jnp.bfloat16,
                                                      size, batch)
print("RESULT " + json.dumps(out))
"""


def run(no_phase: bool):
    env = dict(os.environ)
    env.pop("XGAN_NO_PHASE", None)
    if no_phase:
        env.pop("XGAN_PHASE", None)
    else:
        env["XGAN_PHASE"] = "1"
    r = subprocess.run([sys.executable, "-c",
                        SCRIPT.format(repo=REPO)],
                       env=env, capture_output=True, text=True,
                       timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError((r.stdout[-2000:], r.stderr[-2000:]))


if __name__ == "__main__":
    base = run(no_phase=True)
    print(json.dumps({"variant": "dilated (default)", **base}),
          flush=True)
    phase = run(no_phase=False)
    print(json.dumps({"variant": "phase", **phase}), flush=True)
    for k in base:
        print(f"{k}: dilated {base[k]['sec_per_step']*1e3:.2f} ms"
              f" vs phase {phase[k]['sec_per_step']*1e3:.2f} ms"
              f" -> {base[k]['sec_per_step']/phase[k]['sec_per_step']:.3f}x")
