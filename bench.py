#!/usr/bin/env python
"""Benchmark: fused DCGAN train step at 64x64 (BASELINE.json config #1).

Times the full fused training iteration (on-device batch gather +
flip/normalize + D update + G update — everything the reference does per
iteration in train_gan.py:119-150) on the default backend and prints ONE
JSON line:

  {"metric": ..., "value": imgs/sec, "unit": "imgs/sec", "vs_baseline": x}

Measures the trainers' K=32 --steps-per-call dispatch mode (K training
iterations per dispatched lax.scan program, numerically identical to the
K=1 loop — tests/test_multistep.py): at 64px the scan amortizes both the
remote-tunnel dispatch and the per-program device overhead, ~4x the
single-dispatch rate (tools/bench_multistep.py; the K sweep in
BENCH_DETAIL's multistep_k_sweep puts K=32 +4.7% over K=8, asymptoting —
per-step cost is approaching the pure device step).

vs_baseline compares against the PyTorch-CPU reference step rate measured
on this host by tools/measure_torch_baseline.py (BASELINE_MEASURED.json;
the BASELINE.json north-star asks for >= 10x).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference-equivalent 64px bench config.
IMAGE_SIZE = 64
BATCH = 128
LATENT = 100
FEATURE_MAPS = 64
WARMUP = 3
ITERS = 20
STEPS_PER_CALL = 32
FALLBACK_BASELINE_IMGS_PER_SEC = 70.59  # torch-CPU b128, this host (2026-08)


def _wait_for_default_backend(budget_s: float = 480.0) -> bool:
    """Probe default-backend init in SUBPROCESSES with a bounded budget.

    A dead axon tunnel HANGS plugin init (it does not raise), and a hung
    init inside this process cannot be cancelled — the round-3 dryrun
    sat >20 min inside jax.devices(). Probing in a killable child keeps
    this process clean: on success the tunnel is alive and our own init
    will proceed; on budget exhaustion the caller repins to CPU so the
    driver still records an honestly-labeled number (the metric name
    carries the backend suffix)."""
    import subprocess
    deadline = time.time() + budget_s
    attempt = fast_fails = 0
    while time.time() < deadline:
        attempt += 1
        left = max(deadline - time.time(), 10.0)
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=min(150.0, left))
            if r.returncode == 0:
                return True
            # a RAISING init (broken plugin) is deterministic — burning
            # the whole budget on identical retries helps nobody; only
            # hangs (TimeoutExpired) are worth the full budget
            fast_fails += 1
            if fast_fails >= 2:
                print("note: default-backend init raises (not hangs); "
                      "skipping remaining probes", file=sys.stderr)
                return False
        except subprocess.TimeoutExpired:
            pass
        print(f"note: default-backend probe {attempt} failed; retrying",
              file=sys.stderr)
        time.sleep(min(20.0, max(deadline - time.time(), 0)))
    return False


def main():
    # NB: do NOT enable jax's local persistent compilation cache here —
    # measured on this backend it never captures the TPU programs (the
    # axon server caches compiles across connections itself: a re-run
    # within the server-cache lifetime compiles in ~2 min vs ~10 cold,
    # with the local cache dir EMPTY), while it does capture small
    # XLA:CPU AOT executables whose reload trips machine-feature
    # mismatches ("could lead to SIGILL").
    import jax

    if not _wait_for_default_backend():
        print("note: default backend unreachable within the probe budget "
              "(hung tunnel?); benching on CPU instead", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from xgan.models import dcgan
    from xgan.parallel import create_mesh
    from xgan.train.common import adam, create_state
    from xgan.train.gan import make_dcgan_step

    backend = jax.default_backend()
    dtype = jnp.float32 if backend == "cpu" else jnp.bfloat16
    # emergency-CPU (and local --cpu) runs: K=1, one rep, 1->4-chunk
    # slope — a step is ~16.5 s on this 1-core host (fp32, no MXU), so
    # the TPU-shaped schedule would burn half an hour for a number whose
    # only job is to be honestly labeled `_cpu`
    on_cpu = backend == "cpu"
    k_steps = 1 if on_cpu else STEPS_PER_CALL
    reps = 1 if on_cpu else 3
    warmup = 1 if on_cpu else WARMUP
    mesh_ctx = create_mesh()
    batch = mesh_ctx.pad_batch(BATCH)

    g_model = dcgan.Generator(latent_dim=LATENT, feature_maps=FEATURE_MAPS,
                              image_size=IMAGE_SIZE, dtype=dtype)
    d_model = dcgan.Discriminator(feature_maps=FEATURE_MAPS,
                                  image_size=IMAGE_SIZE, dtype=dtype)
    g_tx, d_tx = adam(2e-4, 0.5), adam(2e-4, 0.5)
    k = jax.random.key(0)
    g_state = mesh_ctx.replicate(create_state(
        g_model, g_tx, k, jnp.zeros((2, LATENT)), train=False))
    d_state = mesh_ctx.replicate(create_state(
        d_model, d_tx, k, jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 3)),
        train=False))

    images = mesh_ctx.replicate(jnp.asarray(
        np.random.default_rng(0).integers(
            0, 255, (4096, IMAGE_SIZE, IMAGE_SIZE, 3), np.uint8)))
    base_key = jax.random.key(2)

    def measure(k):
        """Chain-slope timing of the steps_per_call=k program.

        A device_get (true host sync) ends each chain: dependent steps
        cannot be deduplicated or reordered, and the slope between two
        chain lengths cancels the remote tunnel's large, variable
        dispatch/sync overhead. (block_until_ready is NOT a reliable
        sync on this remote backend — see CLAUDE.md.) Chains are counted
        in k-step chunks; the slope divides back to per-step."""
        step = make_dcgan_step(g_model, d_model, g_tx, d_tx,
                               latent_dim=LATENT, dtype=dtype,
                               batch_sharding=mesh_ctx.batch_sharding(4),
                               donate=False, steps_per_call=k)
        rng = np.random.default_rng(1)
        st = {"g": g_state, "d": d_state}

        def run(chunk_i):
            # distinct rows per scanned step (identical rows would let
            # XLA hoist the gather out of the scan)
            idx = jnp.asarray(rng.integers(0, 4096, (k, batch), np.int64)
                              .astype(np.int32))
            if k > 1:
                return step(st["g"], st["d"], images, idx,
                            jnp.int32(chunk_i * k), base_key)
            return step(st["g"], st["d"], images, idx[0],
                        jax.random.fold_in(base_key, chunk_i))

        def chain(n_chunks, base):
            metrics = None
            t0 = time.time()
            for c in range(n_chunks):
                st["g"], st["d"], metrics = run(base + c)
            np.asarray(jax.device_get(metrics))
            return time.time() - t0

        chain(warmup, 0)  # compile + warm
        n_short = 1 if on_cpu else (2 if k > 1 else 5)
        n_long = n_short + (3 if on_cpu else max(ITERS // k, 5) * 2)
        slopes = []
        for rep in range(reps):  # median of 3: the tunnel is noisy
            t_short = chain(n_short, 100 + 1000 * rep)
            t_long = chain(n_long, 200 + 1000 * rep)
            slopes.append(max((t_long - t_short) / (n_long - n_short) / k,
                              1e-9))
        slopes.sort()
        return slopes[len(slopes) // 2]

    try:
        try:
            dt = measure(k_steps)
        except Exception as e:  # driver artifact must never be empty
            print(f"note: steps_per_call={k_steps} bench failed "
                  f"({type(e).__name__}: {e}); falling back to "
                  "single-step", file=sys.stderr)
            dt = measure(1)
        imgs_per_sec = batch / dt
    except Exception as e:  # even the K=1 path can die (tunnel drop
        # post-probe, host OOM): the ONE-JSON-line invariant still holds,
        # with an honest 0 instead of a traceback and no artifact
        print(f"note: bench failed entirely ({type(e).__name__}: {e}); "
              "reporting 0", file=sys.stderr)
        imgs_per_sec = 0.0

    baseline = FALLBACK_BASELINE_IMGS_PER_SEC
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        # prefer the like-for-like batch-128 torch measurement (the
        # reference batch, train_gan.py:231) over the b16 smoke number
        entry = (data.get("torch_cpu_dcgan_64_b128")
                 or data["torch_cpu_dcgan_64"])
        baseline = entry["imgs_per_sec"]

    print(json.dumps({
        "metric": f"dcgan64_train_imgs_per_sec_{backend}",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/sec",
        "vs_baseline": round(imgs_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
