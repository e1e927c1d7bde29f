"""HTTP serving (src/serve.py): health, prediction parity with the live
model, error envelope — for both the StableHLO-artifact and checkpoint
model formats."""
import io
import json
import os
import subprocess
import sys
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src")


def _tiny_classifier():
    # default stage sizes: the server's checkpoint branch builds the
    # full-depth ResNet-50, exactly like src/predict.py
    from xgan.models.resnet import ResNet50
    model = ResNet50(num_classes=2)
    v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    return model, {"params": v["params"], "batch_stats": v["batch_stats"]}


def _start(model_path, *extra):
    import queue
    import threading

    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.join(SRC, "serve.py"), "--cpu",
         "--model-path", model_path, "--port", "0", "--image-size", "32",
         *extra],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    # reader thread: a plain readline() would block forever if the server
    # hangs before printing, defeating the deadline below
    q = queue.Queue()
    threading.Thread(
        target=lambda: [q.put(ln) for ln in proc.stdout],
        daemon=True).start()
    deadline = time.time() + 300
    while time.time() < deadline:
        try:
            line = q.get(timeout=5)
        except queue.Empty:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"server died: stderr={proc.stderr.read()[-2000:]}")
            continue
        if "Serving" in line:
            return proc, int(line.rsplit(":", 1)[-1].strip())
        if proc.poll() is not None:
            raise RuntimeError(
                f"server died: stdout={line!r} "
                f"stderr={proc.stderr.read()[-2000:]}")
    proc.kill()
    raise RuntimeError("server did not print its Serving line in 300s")


def _post(port, path, data):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_generator_artifact(tmp_path):
    """A generator .stablehlo serves POST /generate: the returned PNG
    must equal the live model's output for the documented z derivation
    (z = normal(key(seed), (1, latent)))."""
    from PIL import Image

    from xgan.data.pipeline import tanh_to_u8
    from xgan.io_.export import export_generator, save_exported
    from xgan.models.dcgan import Generator

    model = Generator(latent_dim=16, feature_maps=8, image_size=32)
    v = model.init(jax.random.key(1), jnp.zeros((1, 16)), train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    path = str(tmp_path / "gen.stablehlo")
    save_exported(path, export_generator(model, v, 16))

    z = jax.random.normal(jax.random.key(3), (1, 16), jnp.float32)
    want = np.asarray(tanh_to_u8(model.apply(v, z, train=False)))[0]

    proc, port = _start(path)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["kind"] == "generator"
        assert health["latent_dim"] == 16 and not health["conditional"]

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"seed": 3}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["Content-Type"] == "image/png"
            got = np.asarray(Image.open(io.BytesIO(r.read())))
        np.testing.assert_array_equal(got, want)

        # wrong endpoint for the model kind -> structured 404
        status, out = _post(port, "/predict", b"{}")
        assert status == 404 and "generators" in out["error"]

        # non-object JSON bodies -> structured 400, not a dead thread
        for bad in (b"5", b"null", b'"x"', b"[1]"):
            status, out = _post(port, "/generate", bad)
            assert status == 400 and "error" in out, bad
        # values that json/int() accept but the device path cannot
        status, out = _post(port, "/generate",
                            json.dumps({"seed": 2**64}).encode())
        assert status == 400 and "seed" in out["error"]
        # bare POST (Content-Length 0) -> defaults to seed 0
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b"", method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["Content-Type"] == "image/png"
        # non-conditional generators IGNORE label (parity with the old
        # per-request path): a junk value must be dropped BEFORE the
        # shared batch, where np.asarray(int32) would 500 every
        # co-batched request
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"seed": 3, "label": "positive"}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            got = np.asarray(Image.open(io.BytesIO(r.read())))
        np.testing.assert_array_equal(got, want)
        # server still alive and correct after the error barrage
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"seed": 3}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            got = np.asarray(Image.open(io.BytesIO(r.read())))
        np.testing.assert_array_equal(got, want)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_serve_predict_concurrent_batching(tmp_path):
    """Dynamic micro-batching: 12 concurrent /predict requests (distinct
    images) through a --max-batch 4 server must each get THEIR OWN
    image's prediction — coalesced rows must not be permuted, padded
    rows must not leak — matching the live model to 1e-5."""
    import concurrent.futures

    from PIL import Image

    from xgan.data.pipeline import normalize_images
    from xgan.io_.export import export_classifier, save_exported
    from xgan.models.resnet import ResNet50

    model = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))
    v = model.init(jax.random.key(2), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    path = str(tmp_path / "clf.stablehlo")
    save_exported(path, export_classifier(model, v, 32))

    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 255, (12, 32, 32, 3), np.uint8)
    logits = model.apply(v, normalize_images(jnp.asarray(imgs)),
                         train=False)
    want = np.asarray(jax.nn.softmax(logits.astype(jnp.float32), -1)[:, 1])

    bodies = []
    for img in imgs:
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        bodies.append(buf.getvalue())

    proc, port = _start(path, "--max-batch", "4")
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            assert json.loads(r.read())["max_batch"] == 4
        with concurrent.futures.ThreadPoolExecutor(12) as pool:
            results = list(pool.map(
                lambda b: _post(port, "/predict", b), bodies))
        for i, (status, out) in enumerate(results):
            assert status == 200, out
            assert abs(out["prob_positive"] - float(want[i])) < 1e-5, i
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_serve_conditional_generator_label_contract(tmp_path):
    """A cgan artifact serves labeled generation; out-of-range labels
    must 400 — XLA clamps out-of-range embedding gathers silently, so
    without validation the client would get a wrong-class image with a
    200. The class count comes from the artifact's self-description
    envelope (3 here), not the server's --num-classes default (2)."""
    from PIL import Image

    from xgan.data.pipeline import tanh_to_u8
    from xgan.io_.export import export_generator, save_exported
    from xgan.models.cgan import Generator

    model = Generator(latent_dim=16, feature_maps=8, image_size=32,
                      num_classes=3)
    v = model.init(jax.random.key(1), jnp.zeros((1, 16)),
                   jnp.zeros((1,), jnp.int32), train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    path = str(tmp_path / "cgen.stablehlo")
    save_exported(path, export_generator(model, v, 16, conditional=True),
                  meta={"kind": "cgan", "conditional": True,
                        "latent_dim": 16, "num_classes": 3})

    z = jax.random.normal(jax.random.key(5), (1, 16), jnp.float32)
    want = np.asarray(tanh_to_u8(model.apply(
        v, z, jnp.asarray([2], jnp.int32), train=False)))[0]

    proc, port = _start(path)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["conditional"] and health["num_classes"] == 3

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"seed": 5, "label": 2}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            got = np.asarray(Image.open(io.BytesIO(r.read())))
        np.testing.assert_array_equal(got, want)

        for bad_label in (3, 7, -1):
            status, out = _post(port, "/generate", json.dumps(
                {"seed": 0, "label": bad_label}).encode())
            assert status == 400 and "label" in out["error"], bad_label
    finally:
        proc.terminate()
        proc.wait(timeout=30)


@pytest.mark.parametrize("fmt", ["stablehlo", "msgpack"])
def test_serve_predict_parity(tmp_path, fmt):
    from PIL import Image

    from xgan.data.pipeline import normalize_images

    model, variables = _tiny_classifier()
    if fmt == "stablehlo":
        from xgan.io_.export import export_classifier, save_exported
        path = str(tmp_path / "clf.stablehlo")
        save_exported(path, export_classifier(model, variables, 32))
    else:
        from xgan.io_.checkpoint import save_variables
        path = str(tmp_path / "clf.msgpack")
        save_variables(path, variables)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    logits = model.apply(variables, normalize_images(jnp.asarray(img[None])),
                         train=False)
    want_prob = float(jax.nn.softmax(
        logits.astype(jnp.float32), -1)[0, 1])

    proc, port = _start(path)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["image_size"] == 32

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        status, out = _post(port, "/predict", buf.getvalue())
        assert status == 200
        assert out["label"] in (0, 1)
        assert abs(out["prob_positive"] - want_prob) < 1e-5

        # error envelope: undecodable body -> structured 400, server lives
        status, out = _post(port, "/predict", b"not a png")
        assert status == 400 and "error" in out
        status, _ = _post(port, "/predict", buf.getvalue())
        assert status == 200
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_batcher_timeout_and_error_paths():
    """_Batcher unit contracts: a hung device call times out the waiter
    (and the abandoned request leaves the queue) instead of parking
    handler threads forever; a raising inference wakes every waiter with
    the error instead of wedging the worker."""
    import importlib.util
    import threading
    import time as _time

    spec = importlib.util.spec_from_file_location(
        "serve_mod", os.path.join(SRC, "serve.py"))
    serve_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_mod)

    gate = threading.Event()

    def hanging_run(items, bucket):
        gate.wait(30)  # simulates the tunnel hang, bounded for the test
        return [(0, 0.0)] * len(items)

    b = serve_mod._Batcher(hanging_run, max_batch=4)
    img = np.zeros((8, 8, 3), np.uint8)
    t0 = _time.time()
    with pytest.raises(TimeoutError):
        b.submit(img, timeout=0.5)
    assert _time.time() - t0 < 5
    # a second queued-then-abandoned request must not linger
    threading.Thread(target=lambda: b.submit(img, timeout=0.2),
                     daemon=True).start()
    _time.sleep(0.6)
    with b.cond:
        assert not b.queue
    gate.set()  # release the worker

    def raising_run(items, bucket):
        raise RuntimeError("device fell over")

    b2 = serve_mod._Batcher(raising_run, max_batch=4)
    results = []

    def client():
        try:
            b2.submit(img, timeout=10)
        except RuntimeError as e:
            results.append(str(e))

    threads = [threading.Thread(target=client) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=15)
    assert results == ["device fell over"] * 3
    # the worker survives the exception and serves the next request
    b2.run_bucket = lambda items, bucket: [(1, 0.5)] * len(items)
    label, prob = b2.submit(img, timeout=10)
    assert (label, prob) == (1, 0.5)


def _load_serve_mod():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "serve_mod_hb", os.path.join(SRC, "serve.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_heartbeat_tracks_latency_and_staleness():
    """_Heartbeat unit contracts: a healthy beat keeps device_ok true
    with a measured latency; once beats stop succeeding, device_ok flips
    after stale_after and the error is surfaced; a recovered device
    flips it back. Motivated by an observed production failure mode:
    the HTTP stack stays healthy while the device tunnel silently
    wedges, so a liveness-only /healthz keeps a dead replica in
    rotation."""
    import threading

    serve_mod = _load_serve_mod()
    broken = threading.Event()

    def beat():
        if broken.is_set():
            raise RuntimeError("tunnel wedged")

    hb = serve_mod._Heartbeat(beat, interval=0.05, stale_after=0.5)
    deadline = time.time() + 10
    while hb.beats < 2 and time.time() < deadline:
        time.sleep(0.02)
    ok, s = hb.status()
    assert ok and s["device_ok"]
    assert s["heartbeat_latency_s"] >= 0
    assert "heartbeat_error" not in s

    broken.set()
    deadline = time.time() + 10
    while time.time() < deadline:
        ok, s = hb.status()
        if not ok:
            break
        time.sleep(0.05)
    assert not ok and not s["device_ok"]
    assert "wedged" in s["heartbeat_error"]

    broken.clear()
    deadline = time.time() + 10
    while time.time() < deadline:
        ok, s = hb.status()
        if ok:
            break
        time.sleep(0.05)
    assert ok and "heartbeat_error" not in s


def test_heartbeat_startup_grace():
    """Before the first beat completes (e.g. a slow first dispatch),
    status stays ok for stale_after — the model already proved the
    device during pre-traffic compiles."""
    import threading

    serve_mod = _load_serve_mod()
    gate = threading.Event()
    hb = serve_mod._Heartbeat(lambda: gate.wait(30), interval=0.05,
                              stale_after=5.0)
    ok, s = hb.status()
    assert ok and s["device_ok"]
    gate.set()


def test_serve_healthz_heartbeat_fields(tmp_path):
    """--heartbeat N: /healthz gains device_ok/heartbeat_* fields backed
    by real periodic dispatches through the serving path."""
    from xgan.io_.export import export_generator, save_exported
    from xgan.models.dcgan import Generator

    model = Generator(latent_dim=16, feature_maps=8, image_size=32)
    v = model.init(jax.random.key(1), jnp.zeros((1, 16)), train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    path = str(tmp_path / "gen.stablehlo")
    save_exported(path, export_generator(model, v, 16))

    proc, port = _start(path, "--heartbeat", "0.2")
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
                health = json.loads(r.read())
            if "heartbeat_latency_s" in health:
                break
            time.sleep(0.2)
        assert health["ok"] and health["device_ok"]
        assert health["heartbeat_latency_s"] >= 0
        assert health["heartbeat_age_s"] < 60
        # a generate through the same (locked) path still works with the
        # heartbeat competing for it
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"seed": 1}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["Content-Type"] == "image/png"
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_metrics_render_unit():
    """_Metrics exposition-format contracts: counter lines per
    (endpoint, code), cumulative histogram buckets with +Inf == count,
    batcher occupancy/pad accounting."""
    serve_mod = _load_serve_mod()
    m = serve_mod._Metrics()
    m.observe_request("/predict", 200, 0.05)
    m.observe_request("/predict", 200, 0.3)
    m.observe_request("/predict", 400, 0.001)
    m.observe_batch(3, 4, 0.02)
    m.observe_batch(4, 4, 0.02)
    text = m.render()
    lines = text.splitlines()
    assert 'xgan_requests_total{endpoint="/predict",code="200"} 2' in lines
    assert 'xgan_requests_total{endpoint="/predict",code="400"} 1' in lines
    # histogram: buckets are cumulative; +Inf equals the count
    assert ('xgan_request_latency_seconds_bucket{endpoint="/predict",'
            'le="0.005"} 1') in lines
    assert ('xgan_request_latency_seconds_bucket{endpoint="/predict",'
            'le="0.1"} 2') in lines
    assert ('xgan_request_latency_seconds_bucket{endpoint="/predict",'
            'le="+Inf"} 3') in lines
    assert ('xgan_request_latency_seconds_count{endpoint="/predict"} 3'
            in lines)
    assert "xgan_batch_dispatches_total 2" in lines
    assert "xgan_batch_rows_total 7" in lines
    assert "xgan_batch_padded_rows_total 1" in lines
    assert 'xgan_batch_occupancy{rows="3"} 1' in lines
    assert "xgan_device_dispatch_seconds_count 2" in lines
    # sums parse as floats
    sums = [ln for ln in lines if "_sum" in ln]
    assert sums and all(float(ln.rsplit(" ", 1)[1]) >= 0 for ln in sums)


def test_serve_metrics_endpoint(tmp_path):
    """GET /metrics over real HTTP: per-endpoint request counters and
    latency histograms reflect the traffic actually served (2 good
    /generate, 1 structured 400, healthz scrapes)."""
    from xgan.io_.export import export_generator, save_exported
    from xgan.models.dcgan import Generator

    model = Generator(latent_dim=16, feature_maps=8, image_size=32)
    v = model.init(jax.random.key(1), jnp.zeros((1, 16)), train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    path = str(tmp_path / "gen.stablehlo")
    save_exported(path, export_generator(model, v, 16))

    proc, port = _start(path)
    try:
        for seed in (1, 2):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"seed": seed}).encode(), method="POST")
            with urllib.request.urlopen(req, timeout=60) as r:
                assert r.status == 200
        code, _ = _post(port, "/generate", b"[1,2]")  # non-object body
        assert code == 400
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            assert r.status == 200
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=60) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        lines = text.splitlines()
        assert ('xgan_requests_total{endpoint="/generate",code="200"} 2'
                in lines)
        assert ('xgan_requests_total{endpoint="/generate",code="400"} 1'
                in lines)
        assert ('xgan_requests_total{endpoint="/healthz",code="200"} 1'
                in lines)
        assert ('xgan_request_latency_seconds_count{endpoint="/generate"}'
                ' 3' in lines)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_key_data_pack_matches_jax():
    """/generate batching packs each request's threefry key data on the
    HOST (serve._key_data) so batched rows need no per-request device
    key construction; the pack must equal jax.random.key(seed) exactly
    for every representable seed (incl. negatives and >32-bit values,
    which jax truncates with x64 disabled)."""
    serve = _load_serve_mod()
    for s in [0, 1, 5, -1, -5, 2**31 - 1, 2**31, 2**40, -2**40,
              2**63 - 1, -2**63, 1234567890123]:
        want = np.asarray(jax.random.key_data(jax.random.key(s)))
        np.testing.assert_array_equal(serve._key_data(s), want, err_msg=s)


def test_serve_generate_concurrent_batching(tmp_path):
    """Generator micro-batching: 8 concurrent /generate requests
    (distinct seeds) through a --max-batch 4 server must each get THEIR
    OWN seed's image, bit-identical to the live model's
    z = normal(key(seed), (1, latent)) — coalesced seeds must not be
    permuted and pad rows must not leak."""
    import concurrent.futures

    from PIL import Image

    from xgan.data.pipeline import tanh_to_u8
    from xgan.io_.export import export_generator, save_exported
    from xgan.models.dcgan import Generator

    model = Generator(latent_dim=16, feature_maps=8, image_size=32)
    v = model.init(jax.random.key(1), jnp.zeros((1, 16)), train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    path = str(tmp_path / "gen.stablehlo")
    save_exported(path, export_generator(model, v, 16))

    seeds = list(range(8))
    want = [np.asarray(tanh_to_u8(model.apply(
        v, jax.random.normal(jax.random.key(s), (1, 16), jnp.float32),
        train=False)))[0] for s in seeds]

    def fetch(port, seed):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"seed": seed}).encode(), method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            return np.asarray(Image.open(io.BytesIO(r.read())))

    proc, port = _start(path, "--max-batch", "4")
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            assert json.loads(r.read())["max_batch"] == 4
        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            results = list(pool.map(lambda s: fetch(port, s), seeds))
        for i, got in enumerate(results):
            np.testing.assert_array_equal(got, want[i], err_msg=i)
        # batched responses must equal a later UNBATCHED (sequential)
        # fetch of the same seed — batching is invisible to clients
        np.testing.assert_array_equal(fetch(port, 5), want[5])
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_batcher_probe_submissions_excluded_from_metrics():
    """Heartbeat probes ride the real dispatch path but must not skew
    the tuning metrics: a 1 Hz heartbeat on an idle server would
    otherwise dominate rows/occupancy and a dashboard would read the
    opposite of the real traffic shape."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "serve_mod", os.path.join(SRC, "serve.py"))
    serve_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_mod)

    m = serve_mod._Metrics()
    b = serve_mod._Batcher(lambda items, bucket: list(range(len(items))),
                           max_batch=4, metrics=m)
    for _ in range(5):  # pure-probe dispatches: unrecorded
        b.submit("probe", probe=True)
    assert m.batches == 0 and m.rows == 0 and m.padded == 0
    assert m.batch_size == {} and m.device[1] == 0
    b.submit("real")  # real traffic still counts
    assert m.batches == 1 and m.rows == 1 and m.device[1] == 1


def test_batcher_backpressure_overload():
    """--max-queue backpressure: once max_queue requests are waiting
    behind a busy device, the next submit raises Overloaded IMMEDIATELY
    (fast-fail 503 material, not another parked thread), probes bypass
    the bound so the heartbeat keeps measuring the device, and the
    rejection lands in /metrics as xgan_batch_rejected_total."""
    import threading
    import time as _time

    mod = _load_serve_mod()
    entered, release = threading.Event(), threading.Event()

    def blocking_run(items, bucket):
        entered.set()
        release.wait(30)
        return ["ok"] * len(items)

    metrics = mod._Metrics()
    b = mod._Batcher(blocking_run, max_batch=1, metrics=metrics,
                     max_queue=2)
    results = []
    threads = [threading.Thread(
        target=lambda: results.append(b.submit("p", timeout=30)),
        daemon=True) for _ in range(3)]
    threads[0].start()
    assert entered.wait(10)  # the worker is now blocked in-flight
    threads[1].start()
    threads[2].start()
    deadline = _time.time() + 10
    while _time.time() < deadline:  # both followers queued behind it
        with b.cond:
            if len(b.queue) == 2:
                break
        _time.sleep(0.01)
    with b.cond:
        assert len(b.queue) == 2
    t0 = _time.time()
    with pytest.raises(mod.Overloaded):
        b.submit("p4", timeout=30)
    assert _time.time() - t0 < 1.0  # rejected at submit, no blocking
    probe_res = []
    pt = threading.Thread(target=lambda: probe_res.append(
        b.submit("probe", timeout=30, probe=True)), daemon=True)
    pt.start()
    release.set()
    for t in threads:
        t.join(timeout=15)
    pt.join(timeout=15)
    assert results == ["ok"] * 3 and probe_res == ["ok"]
    assert metrics.rejected == 1
    assert "xgan_batch_rejected_total 1" in metrics.render()


def test_serve_graceful_drain(tmp_path):
    """SIGTERM drain contract (the serving twin of the trainers'
    GracefulShutdown): the in-flight request still gets its 200, new
    POSTs get a structured 503 server-draining, /healthz flips to 503
    with draining:true so an orchestrator pulls the replica, and the
    process exits 0 once the in-flight work is done."""
    import signal
    import socket

    from xgan.io_.export import export_generator, save_exported
    from xgan.models.dcgan import Generator

    model = Generator(latent_dim=16, feature_maps=8, image_size=32)
    v = model.init(jax.random.key(1), jnp.zeros((1, 16)), train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    path = str(tmp_path / "gen.stablehlo")
    save_exported(path, export_generator(model, v, 16))

    proc, port = _start(path)
    try:
        body = json.dumps({"seed": 3}).encode()
        # hold the last body byte back: the request enters the handler
        # (active gauge up, draining check passed) and blocks reading
        s = socket.create_connection(("127.0.0.1", port), timeout=60)
        s.sendall(b"POST /generate HTTP/1.1\r\nHost: x\r\n"
                  b"Connection: close\r\n"
                  + f"Content-Length: {len(body)}\r\n\r\n".encode()
                  + body[:1])
        time.sleep(1.0)  # let the handler thread enter the body read
        proc.send_signal(signal.SIGTERM)

        # /healthz flips to 503 draining while the server stays up
        drained_health = None
        deadline = time.time() + 20
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz",
                        timeout=10) as r:
                    pass  # not draining yet
            except urllib.error.HTTPError as e:
                if e.code == 503:
                    drained_health = json.loads(e.read())
                    break
            time.sleep(0.05)
        assert drained_health is not None
        assert drained_health.get("draining") is True

        # new work is refused with a structured, retryable 503
        status, out = _post(port, "/generate",
                            json.dumps({"seed": 1}).encode())
        assert status == 503 and "draining" in out["error"]

        # ...but the in-flight request completes normally
        s.sendall(body[1:])
        s.settimeout(60)
        buf = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
        s.close()
        head, _, payload = buf.partition(b"\r\n\r\n")
        assert b"200" in head.split(b"\r\n", 1)[0]
        assert payload.startswith(b"\x89PNG")

        assert proc.wait(timeout=30) == 0  # clean exit after the drain
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
