"""Driver entry points stay working: entry() compiles, dryrun executes.

Includes the round-2 hermeticity guard (VERDICT.md "Next round" #1): the
driver's exact ordering — entry() then dryrun_multichip(8) in ONE process
whose default platform is a *poisoned* TPU plugin — must succeed without
ever dispatching on the default backend. Poisoning: with
``PALLAS_AXON_POOL_IPS`` removed, this environment's sitecustomize never
registers the axon plugin, so ``JAX_PLATFORMS=axon`` makes every
default-backend access raise; only explicitly-CPU-pinned work survives.
"""
import os
import pathlib
import subprocess
import sys

import jax

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles_single_device():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8,)


def test_driver_ordering_survives_poisoned_default_backend():
    """entry() -> lower -> dryrun_multichip(8) with a dead TPU plugin.

    Reproduces MULTICHIP_r01's failure mode (eager dispatch on a broken
    default TPU client after entry() ran) and asserts the round-2 fix:
    everything that must not depend on the TPU stays on the CPU client.
    """
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize skips register()
    env["JAX_PLATFORMS"] = "axon"          # the production pin stays
    script = (
        "import __graft_entry__ as ge\n"
        "fn, args = ge.entry()\n"
        "import jax\n"
        "jax.jit(fn).lower(*args)\n"
        "ge.dryrun_multichip(8)\n"
        "print('HERMETIC_OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", script], cwd=REPO_ROOT,
                       env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    assert "HERMETIC_OK" in r.stdout
    assert "dryrun_multichip OK on 8 cpu devices" in r.stdout


def test_dryrun_survives_hanging_default_backend():
    """A dead TPU tunnel HANGS plugin init (observed round 3: a
    standalone dryrun blocked >20 min inside jax.devices("cpu") because
    the axon plugin initializes first) rather than raising, so the
    raise-then-repin fallback never fires. The dry run must repin to CPU
    BEFORE any backend discovery when nothing has initialized yet.

    Mechanism test: a fake 'axon' plugin whose factory blocks forever is
    registered in a fresh process (the real one is skipped by popping
    PALLAS_AXON_POOL_IPS); _cpu_devices(prefer_cpu_pin=True) must come
    back with CPU devices without ever calling the factory. The bounded
    subprocess timeout IS the assertion — a regression hangs here."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "axon"
    script = (
        "import time\n"
        "from jax._src import xla_bridge\n"
        "def hung_tunnel_factory():\n"
        "    time.sleep(10**9)\n"
        "xla_bridge.register_backend_factory('axon', hung_tunnel_factory,"
        " priority=400)\n"
        "import __graft_entry__ as ge\n"
        "devs = ge._cpu_devices(prefer_cpu_pin=True)\n"
        "assert devs and devs[0].platform == 'cpu', devs\n"
        "print('CPU_PIN_OK', len(devs))\n"
    )
    r = subprocess.run([sys.executable, "-c", script], cwd=REPO_ROOT,
                       env=env, capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    assert "CPU_PIN_OK" in r.stdout
