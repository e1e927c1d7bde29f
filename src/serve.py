#!/usr/bin/env python
"""Minimal HTTP model server (beyond-reference capability; the reference
has no serving path at all).

Serves either model family:

    classifier  POST /predict   body = PNG bytes
                                -> {"label": 0|1, "prob_positive": float}
    generator   POST /generate  body = {"seed": int[, "label": 0|1]}
                                -> PNG bytes (one synthetic image;
                                   z = normal(key(seed), (1, latent)))
    both        GET  /healthz   -> {"ok": true, "kind": ..., ...}

``--model-path`` accepts a self-contained StableHLO artifact written by
src/export_model.py (.stablehlo — the model kind, image size and latent
dim are read from the artifact's input signature, no model flags needed)
or a classifier checkpoint (.msgpack ours / .pth reference-layout, built
with --image-size; generator checkpoints need their model flags, so
export them to an artifact first). BOTH model kinds serve behind
dynamic micro-batching: concurrent requests coalesce into one device
dispatch (power-of-2 bucket padding up to --max-batch, every bucket
precompiled), so throughput under load scales with the batch instead of
serializing b=1 calls. The classifier path is the same
uint8->probability program predict.py uses; /generate batches the
SEEDS — each row's latent derives from its own request's
jax.random.key(seed) (key data packed on host, parity-asserted), so a
batched response is bit-identical to an unbatched one.

With ``--heartbeat N`` the server probes its own device every N seconds
through the real serving path and /healthz becomes a READINESS check:
it reports device_ok/latency/staleness and returns 503 once the device
stops answering — catching the wedged-transport failure mode where HTTP
stays healthy while every inference hangs.

``GET /metrics`` exposes Prometheus-text counters: per-endpoint request
counts/latency histograms plus micro-batcher occupancy (dispatch sizes,
pad waste, device latency) — the numbers needed to tune --max-batch and
alert on saturation in a real deployment.
"""
import argparse
import io
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(
        description="Serve a trained xgan model over HTTP")
    p.add_argument("--model-path", type=str, required=True,
                   help=".stablehlo artifact (export_model.py; classifier "
                        "or generator) or classifier checkpoint "
                        "(.msgpack/.pth)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--image-size", type=int, default=224,
                   help="checkpoint inputs only; artifacts carry their "
                        "own input signature")
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--max-batch", type=int, default=0,
                   help="dynamic micro-batching cap (/predict images, "
                        "/generate seeds): concurrent requests coalesce "
                        "into one device batch (power-of-2 bucket "
                        "padding, every bucket precompiled). 0 = auto: "
                        "8 on TPU (dispatch overhead dominates a b=1 "
                        "forward), 1 on CPU (compute-bound; batching "
                        "measured 0.7x there)")
    p.add_argument("--max-queue", type=int, default=0,
                   help="overload backpressure: reject a request with "
                        "503 + Retry-After the moment this many are "
                        "already waiting for the device (each queued "
                        "request parks a handler thread holding its "
                        "decoded payload, so an unbounded queue turns a "
                        "flood into thread/memory growth + client "
                        "timeouts). 0 = auto: max(32, 4*max_batch); "
                        "negative = unbounded")
    p.add_argument("--drain-grace", type=float, default=30.0,
                   help="seconds to let in-flight requests finish after "
                        "SIGTERM/SIGINT before the server stops; during "
                        "the drain /healthz turns 503 (draining: true) "
                        "so orchestrators pull the replica, and new "
                        "POSTs get 503 + Retry-After")
    p.add_argument("--heartbeat", type=float, default=0.0,
                   help="device-liveness heartbeat period in seconds "
                        "(0 = off): a background thread runs the real "
                        "inference program through the serving path and "
                        "/healthz reports device_ok + latency, going 503 "
                        "when the last success is stale — catches a "
                        "wedged device/tunnel that liveness-only health "
                        "checks miss")
    p.add_argument("--cpu", action="store_true")
    from xgan import config
    config.add_compute_dtype_arg(p)  # checkpoint branch only; artifacts
    return p                         # baked their dtype at export time


class _Metrics:
    """Prometheus-text-exposition counters behind GET /metrics.

    Deliberately dependency-free (the exposition format is three line
    shapes: counter samples, histogram buckets, sum/count). Everything
    is guarded by one lock — increments are tiny compared to a device
    dispatch, and the scrape renders a consistent snapshot."""

    # seconds; chosen to straddle both backends (CPU b=1 forward ~50 ms,
    # TPU batched dispatch ~1-10 ms, tunnel stalls in the seconds)
    LAT_BUCKETS = (0.005, 0.025, 0.1, 0.5, 2.5, 10.0)

    def __init__(self):
        self.lock = threading.Lock()
        self.requests = {}      # (endpoint, code) -> count
        self.lat = {}           # endpoint -> [sum, count, per-le counts]
        self.batches = 0        # batcher dispatches
        self.rows = 0           # real images inferred through the batcher
        self.padded = 0         # pad rows dispatched (bucket - occupancy)
        self.batch_size = {}    # dispatch occupancy n -> count
        self.rejected = 0       # submits refused at --max-queue depth
        self.device = [0.0, 0, [0] * (len(self.LAT_BUCKETS) + 1)]

    def observe_rejected(self):
        with self.lock:
            self.rejected += 1

    def _observe(self, holder, seconds):
        holder[0] += seconds
        holder[1] += 1
        for i, le in enumerate(self.LAT_BUCKETS):
            if seconds <= le:
                holder[2][i] += 1
        holder[2][-1] += 1  # +Inf

    def observe_request(self, endpoint, code, seconds):
        with self.lock:
            key = (endpoint, int(code))
            self.requests[key] = self.requests.get(key, 0) + 1
            h = self.lat.setdefault(
                endpoint, [0.0, 0, [0] * (len(self.LAT_BUCKETS) + 1)])
            self._observe(h, seconds)

    def observe_batch(self, n, bucket, seconds):
        with self.lock:
            self.batches += 1
            self.rows += n
            self.padded += bucket - n
            self.batch_size[n] = self.batch_size.get(n, 0) + 1
            self._observe(self.device, seconds)

    def _hist_lines(self, out, name, labels, holder):
        for le, c in zip(self.LAT_BUCKETS, holder[2]):
            out.append(f'{name}_bucket{{{labels}le="{le}"}} {c}')
        out.append(f'{name}_bucket{{{labels}le="+Inf"}} {holder[2][-1]}')
        out.append(f'{name}_sum{{{labels[:-1]}}} {holder[0]:.6f}'
                   if labels else f'{name}_sum {holder[0]:.6f}')
        out.append(f'{name}_count{{{labels[:-1]}}} {holder[1]}'
                   if labels else f'{name}_count {holder[1]}')

    def render(self) -> str:
        with self.lock:
            out = ["# TYPE xgan_requests_total counter"]
            for (ep, code), c in sorted(self.requests.items()):
                out.append(f'xgan_requests_total{{endpoint="{ep}",'
                           f'code="{code}"}} {c}')
            out.append("# TYPE xgan_request_latency_seconds histogram")
            for ep, h in sorted(self.lat.items()):
                self._hist_lines(out, "xgan_request_latency_seconds",
                                 f'endpoint="{ep}",', h)
            out.append("# TYPE xgan_batch_dispatches_total counter")
            out.append(f"xgan_batch_dispatches_total {self.batches}")
            out.append("# TYPE xgan_batch_rows_total counter")
            out.append(f"xgan_batch_rows_total {self.rows}")
            out.append("# TYPE xgan_batch_padded_rows_total counter")
            out.append(f"xgan_batch_padded_rows_total {self.padded}")
            out.append("# TYPE xgan_batch_rejected_total counter")
            out.append(f"xgan_batch_rejected_total {self.rejected}")
            out.append("# TYPE xgan_batch_occupancy counter")
            for n, c in sorted(self.batch_size.items()):
                out.append(f'xgan_batch_occupancy{{rows="{n}"}} {c}')
            out.append("# TYPE xgan_device_dispatch_seconds histogram")
            self._hist_lines(out, "xgan_device_dispatch_seconds", "",
                             self.device)
            return "\n".join(out) + "\n"


class Overloaded(Exception):
    """Raised by _Batcher.submit when the wait queue is at --max-queue.

    Fast-fail backpressure: without a bound, every request that arrives
    while the device is behind parks a handler thread for up to the
    submit timeout (300 s) holding its decoded payload — on a flood the
    server accumulates hundreds of blocked threads + images while
    /healthz stays green, and clients see timeouts instead of a signal
    to back off. Rejecting at a bounded depth turns overload into an
    immediate 503 + Retry-After the caller/LB can act on."""


class _Batcher:
    """Dynamic micro-batching: concurrent requests that arrive while the
    device is busy run together in the next dispatch (up to
    ``max_batch``); an idle server dispatches immediately, so batching
    adds no latency without load. Each dispatch is PADDED to the next
    power-of-2 BUCKET (1,2,4,...,max_batch) — a handful of static
    program shapes, all compiled before traffic, with at most 2x pad
    waste at partial occupancy (always padding to max_batch measured
    0.63x on a compute-bound host). Rows are independent for both
    served model kinds (classifier eval-mode BN uses running
    statistics; generator rows each derive from their own request's
    PRNG key), so padded rows cannot perturb real ones.

    Payload-agnostic: ``run_bucket(items, bucket)`` receives the queued
    request payloads (n <= bucket of them) plus the bucket size, runs
    ONE padded device dispatch, and returns one result per item —
    /predict items are (s,s,3) uint8 images yielding (label, prob),
    /generate items are (key_data, label) yielding an image array."""

    def __init__(self, run_bucket, max_batch: int, metrics=None,
                 max_queue: int = 0):
        self.run_bucket = run_bucket
        self.max_batch = max_batch
        self.max_queue = max_queue  # 0 = unbounded
        self.metrics = metrics
        self.buckets = []
        b = 1
        while b < max_batch:
            self.buckets.append(b)
            b *= 2
        self.buckets.append(max_batch)
        self.cond = threading.Condition()
        self.queue = []  # (payload, slot dict) pairs
        threading.Thread(target=self._worker, daemon=True).start()

    def submit(self, payload, timeout: float = 300.0,
               probe: bool = False):
        # probe=True (heartbeat): exercises the real dispatch path but
        # is EXCLUDED from batcher metrics — a 1 Hz heartbeat would
        # otherwise dominate rows/occupancy on an idle server and a
        # dashboard would read the opposite of the real traffic shape
        slot = {"event": threading.Event(), "probe": probe}
        item = (payload, slot)
        with self.cond:
            # probes bypass the bound: the heartbeat's job is to measure
            # the DEVICE, and a full queue already implies its beat will
            # time out behind the backlog — rejecting it would replace
            # that real signal with a synthetic error
            if (self.max_queue and not probe
                    and len(self.queue) >= self.max_queue):
                if self.metrics is not None:
                    self.metrics.observe_rejected()
                raise Overloaded(
                    f"inference queue full ({self.max_queue} waiting)")
            self.queue.append(item)
            self.cond.notify()
        # bounded wait: this environment's TPU tunnel can HANG a device
        # call (CLAUDE.md); without a timeout every later request would
        # park another handler thread forever while /healthz stays ok
        if not slot["event"].wait(timeout):
            with self.cond:  # drop it if still queued (identity, not ==:
                # ndarray __eq__ breaks `in`); if in flight, just bail
                self.queue = [it for it in self.queue if it is not item]
            raise TimeoutError(f"inference did not complete in "
                               f"{timeout:.0f}s")
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def _worker(self):
        while True:
            with self.cond:
                while not self.queue:
                    self.cond.wait()
                batch = self.queue[:self.max_batch]
                del self.queue[:self.max_batch]
            n = len(batch)
            bucket = next(b for b in self.buckets if b >= n)
            try:
                t0 = time.time()
                results = self.run_bucket([p for p, _ in batch], bucket)
                # count only non-probe rows (heartbeats ride the real
                # path but must not skew the tuning metrics); a pure-
                # probe dispatch is unrecorded, a mixed one counts its
                # probe rows as pad (non-real dispatched rows)
                n_real = sum(1 for _, s in batch if not s.get("probe"))
                if self.metrics is not None and n_real:  # run_bucket
                    self.metrics.observe_batch(n_real, bucket,  # blocked
                                               time.time() - t0)
                for (_, slot), res in zip(batch, results):
                    slot["result"] = res
                    slot["event"].set()
            except Exception as e:  # wake waiters; surface as HTTP 500
                for _, slot in batch:
                    slot["error"] = e
                    slot["event"].set()


class _Heartbeat:
    """Background device-liveness prober backing /healthz readiness.

    Motivated by an observed failure mode of remote-attached
    accelerators: the HTTP stack stays perfectly healthy while the
    device transport silently wedges — every /predict hangs past client
    timeouts but a liveness-only /healthz keeps answering ok, so an
    orchestrator keeps routing traffic to a dead replica. The heartbeat
    runs the REAL inference program through the same path requests take
    every ``interval`` seconds and records latency + outcome; status()
    flips unhealthy once the last success is older than ``stale_after``.

    A beat that hangs forever blocks the prober thread — which is the
    correct signal: the age keeps growing and status() goes stale. If
    the device later recovers and the call returns, beating resumes.
    Startup counts as a success (the server just proved the device
    during pre-traffic compiles), so a slow first beat gets grace."""

    def __init__(self, beat_fn, interval: float, stale_after=None):
        self._time = time.time
        self.beat_fn = beat_fn
        self.interval = interval
        self.stale_after = (stale_after if stale_after is not None
                            else max(3.0 * interval, interval + 60.0))
        self.last_ok = self._time()
        self.latency = None
        self.error = None
        self.beats = 0
        threading.Thread(target=self._loop, daemon=True).start()

    def _loop(self):
        while True:
            t0 = self._time()
            try:
                self.beat_fn()
                self.latency = self._time() - t0
                self.last_ok = self._time()
                self.error = None
            except Exception as e:  # noqa: BLE001 — any failure is the
                self.error = str(e)  # signal, not a crash
            self.beats += 1
            time.sleep(self.interval)

    def status(self):
        age = self._time() - self.last_ok
        ok = age < self.stale_after
        s = {"device_ok": ok, "heartbeat_age_s": round(age, 1)}
        if self.latency is not None:
            s["heartbeat_latency_s"] = round(self.latency, 4)
        if self.error is not None:
            s["heartbeat_error"] = self.error
        return ok, s


def _key_data(seed: int):
    """Host-side replica of jax.random.key(seed)'s threefry key data.

    /generate derives each request's latent from its own seed via
    jax.random.key(seed); batching seeds into ONE dispatch requires the
    (2,) uint32 key data as a device input — computed on host so no
    per-request device round-trip sneaks back in. With x64 disabled
    (this environment) jax packs [0, seed & 0xffffffff]; with x64 it
    packs the full 64 bits. Parity with the real thing is asserted once
    at server start (and pinned for a seed sweep in tests/test_serve.py)
    so a changed default PRNG impl fails loudly, not wrongly."""
    import jax
    import numpy as np
    u = seed & ((1 << 64) - 1)
    hi = (u >> 32) if jax.config.jax_enable_x64 else 0
    return np.array([hi, u & 0xffffffff], np.uint32)


def make_model(args):
    """Returns a descriptor dict: kind 'classifier' (infer_batch,
    image_size) or kind 'generator' (generate_batch, latent_dim,
    conditional)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.model_path.endswith(".stablehlo"):
        from xgan.io_.export import load_exported_with_meta
        art, meta = load_exported_with_meta(args.model_path)
        meta = meta or {}  # pre-envelope artifacts: signature sniffing
        avals = art.in_avals
        # jit the call: eager Exported.call re-traces per request
        run = jax.jit(art.call)

        if (len(avals) == 1 and len(avals[0].shape) == 4
                and avals[0].dtype == jnp.uint8):
            # classifier: one uint8 (b, s, s, 3) input
            return {"kind": "classifier", "infer_batch": run,
                    "image_size": int(avals[0].shape[1])}

        if (len(avals) in (1, 2) and len(avals[0].shape) == 2
                and avals[0].dtype == jnp.float32):
            # generator: z (b, latent) float32 [+ labels (b,) int32]
            latent = int(avals[0].shape[1])
            conditional = len(avals) == 2

            # one-time parity check of the host key-data pack against
            # the live PRNG (see _key_data): each batched row's latent
            # must equal the single-request normal(key(seed), (1, L))
            probe = 123456789
            if not np.array_equal(
                    np.asarray(jax.random.key_data(jax.random.key(probe))),
                    _key_data(probe)):
                raise RuntimeError(
                    "host threefry key-data pack does not match "
                    "jax.random.key on this backend/config; /generate "
                    "batching would change per-seed outputs")

            def generate_batch(kds, labels=None):
                # kds (b, 2) uint32 -> z rows; each row is EXACTLY the
                # single-request z for its seed (tests pin this), so
                # batching is invisible to clients
                keys = jax.random.wrap_key_data(kds)
                z = jax.vmap(lambda k: jax.random.normal(
                    k, (1, latent), jnp.float32)[0])(keys)
                return run(z, labels) if conditional else run(z)

            # class count: the artifact envelope knows it (export_model
            # bakes it); pre-envelope artifacts fall back to the
            # --num-classes flag (default 2, both reference families)
            return {"kind": "generator",
                    "generate_batch": jax.jit(generate_batch),
                    "latent_dim": latent, "conditional": conditional,
                    "num_classes": meta.get("num_classes",
                                            args.num_classes)}

        raise ValueError(
            f"{args.model_path}: unrecognized artifact signature "
            f"{[(a.shape, str(a.dtype)) for a in avals]}; expected a "
            "classifier (one uint8 (b,s,s,3) input) or generator "
            "(float32 (b,latent) [+ int32 labels]) export from "
            "src/export_model.py")

    from xgan import config
    from xgan.io_.checkpoint import load_classifier_variables
    from xgan.io_.export import make_classifier_infer
    from xgan.models.resnet import ResNet50
    model = ResNet50(num_classes=args.num_classes,
                     dtype=config.resolve_dtype(args.compute_dtype))
    like = model.init(
        jax.random.key(0),
        jnp.zeros((1, args.image_size, args.image_size, 3)), train=False)
    variables = load_classifier_variables(
        args.model_path, {"params": like["params"],
                          "batch_stats": like["batch_stats"]})
    run = jax.jit(make_classifier_infer(model, variables))
    return {"kind": "classifier", "infer_batch": run,
            "image_size": args.image_size}


def main():
    args = build_parser().parse_args()
    from xgan import config
    config.apply_device_flag(args)

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import numpy as np
    from PIL import Image

    if not os.path.exists(args.model_path):
        print(f"Error: model not found at {args.model_path}")
        sys.exit(1)
    metrics = _Metrics()
    try:
        desc = make_model(args)
        import jax
        mb = max(1, args.max_batch or (
            1 if jax.default_backend() == "cpu" else 8))
        # queue bound (see Overloaded): deep enough that a healthy device
        # never trips it (a few dispatches' worth), shallow enough that a
        # wedged/slow one rejects in O(s), not O(submit-timeout)
        mq = (args.max_queue if args.max_queue > 0
              else (0 if args.max_queue < 0 else max(32, 4 * mb)))
        # compile before accepting traffic so the first request is fast;
        # inside the envelope: a malformed artifact must fail structured
        if desc["kind"] == "classifier":
            size = desc["image_size"]

            def run_bucket(items, bucket):
                imgs = np.stack(items)
                if imgs.shape[0] < bucket:  # pad rows: repeat the last
                    imgs = np.concatenate(
                        [imgs, np.repeat(imgs[-1:], bucket - imgs.shape[0],
                                         0)])
                labels, probs = desc["infer_batch"](imgs)
                labels, probs = np.asarray(labels), np.asarray(probs)
                return [(int(labels[i]), float(probs[i]))
                        for i in range(len(items))]

            batcher = _Batcher(run_bucket, mb, metrics=metrics,
                               max_queue=mq)
            for b in batcher.buckets:  # compile every bucket pre-traffic
                desc["infer_batch"](np.zeros((b, size, size, 3), np.uint8))
        else:
            conditional = desc["conditional"]

            def run_bucket(items, bucket):
                # items: (key_data (2,) u32, label int) per request
                kds = np.stack([kd for kd, _ in items])
                labs = np.asarray([lb for _, lb in items], np.int32)
                pad = bucket - len(items)
                if pad:
                    kds = np.concatenate([kds, np.repeat(kds[-1:], pad, 0)])
                    labs = np.concatenate([labs, np.repeat(labs[-1:], pad)])
                imgs = np.asarray(desc["generate_batch"](kds, labs)
                                  if conditional
                                  else desc["generate_batch"](kds))
                return [imgs[i] for i in range(len(items))]

            batcher = _Batcher(run_bucket, mb, metrics=metrics,
                               max_queue=mq)
            for b in batcher.buckets:  # compile every bucket pre-traffic
                kds = np.stack([_key_data(0)] * b)
                img = np.asarray(
                    desc["generate_batch"](kds, np.zeros((b,), np.int32))
                    if conditional else desc["generate_batch"](kds))[0]
            desc["image_size"] = int(img.shape[0])
    except Exception as e:  # noqa: BLE001 — structured CLI error contract
        print(f"Error loading model: {e}")
        sys.exit(1)
    model_name = os.path.basename(args.model_path)
    kind = desc["kind"]
    size = desc["image_size"]
    health = {"ok": True, "model": model_name, "kind": kind,
              "image_size": size, "max_batch": batcher.max_batch}
    if kind == "generator":
        health.update(latent_dim=desc["latent_dim"],
                      conditional=desc["conditional"])
        if desc["conditional"]:
            health.update(num_classes=desc["num_classes"])

    heartbeat = None
    if args.heartbeat > 0:
        probe = (np.zeros((size, size, 3), np.uint8)
                 if kind == "classifier" else (_key_data(0), 0))
        # bounded submit: a wedged dispatch times the BEAT out (so
        # beating continues and the error is surfaced) instead of
        # parking the prober until the hung call returns
        beat_timeout = max(2.0 * args.heartbeat, 30.0)

        def beat():
            batcher.submit(probe, timeout=beat_timeout, probe=True)
        heartbeat = _Heartbeat(beat, args.heartbeat)

    # --- graceful drain (SIGTERM/SIGINT): same preemption contract as
    # the trainers (loop_common.GracefulShutdown) applied to serving —
    # finish what's in flight, refuse new work with a structured 503,
    # flip /healthz to draining so an orchestrator pulls the replica,
    # then exit 0. A second signal stops immediately.
    draining = threading.Event()
    active = [0]                 # in-flight POST bodies
    active_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        # bound the per-connection socket: a client that under-delivers
        # Content-Length would otherwise pin a handler thread forever
        # (the read raises socket.timeout -> OSError barrier below)
        timeout = 120

        def _json(self, code, obj, retry_after=None):
            self._code = code
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if retry_after is not None:
                self.send_header("Retry-After", str(retry_after))
            self.end_headers()
            self.wfile.write(body)

        def _observed(self, inner):
            """Run a handler body and record endpoint/code/latency.
            Unknown paths collapse to one 'other' label so a client
            probing random URLs cannot explode metric cardinality."""
            t0 = time.time()
            self._code = 0  # 0 = no response written (e.g. client gone)
            try:
                inner()
            finally:
                path = (self.path if self.path in
                        ("/predict", "/generate", "/healthz", "/metrics")
                        else "other")
                metrics.observe_request(path, self._code,
                                        time.time() - t0)

        def do_GET(self):
            self._observed(self._get)

        def _get(self):
            if self.path == "/healthz":
                payload = dict(health)
                code = 200
                if heartbeat is not None:
                    ok, hs = heartbeat.status()
                    payload.update(hs)
                    if not ok:  # readiness semantics: pull the replica
                        code = 503  # out of rotation, payload says why
                if draining.is_set():
                    payload["draining"] = True
                    code = 503
                self._json(code, payload)
            elif self.path == "/metrics":
                self._code = 200
                body = metrics.render().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "unknown path"})

        def _read_body(self, limit, allow_empty=False):
            try:
                n = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                n = -1
            if n < 0 or (n == 0 and not allow_empty) or n > limit:
                self._json(400, {"error": "bad Content-Length"})
                return None
            return self.rfile.read(n)

        def do_POST(self):
            # gauge BEFORE the body read: a client mid-upload is work in
            # flight the drainer must wait for, not a thread to abandon
            with active_lock:
                active[0] += 1
            try:
                self._observed(self._post)
            except OSError:
                pass  # client went away mid-request/response
            finally:
                with active_lock:
                    active[0] -= 1

        def _post(self):
            if draining.is_set():
                self._json(503, {"error": "server draining"},
                           retry_after=1)
                return
            if self.path == "/predict" and kind == "classifier":
                body = self._read_body(64 * 1024 * 1024)
                if body is None:
                    return
                try:
                    img = Image.open(io.BytesIO(body)).convert("RGB")
                    if img.size != (size, size):
                        img = img.resize((size, size), Image.BILINEAR)
                    u8 = np.asarray(img, np.uint8)
                except Exception as e:  # corrupt/unsupported image
                    self._json(400,
                               {"error": f"could not decode image: {e}"})
                    return
                try:
                    label, prob = batcher.submit(u8)
                except Overloaded as e:  # backpressure: tell the client
                    self._json(503, {"error": str(e)}, retry_after=1)
                    return
                except TimeoutError as e:  # before OSError: subclass
                    self._json(503, {"error": str(e)})
                    return
                except Exception as e:  # noqa: BLE001 — keep serving
                    self._json(500, {"error": f"inference failed: {e}"})
                    return
                self._json(200, {"label": label, "prob_positive": prob})
                return
            if self.path == "/generate" and kind == "generator":
                body = self._read_body(1 << 16, allow_empty=True)
                if body is None:
                    return
                try:
                    req = json.loads(body or b"{}")
                    if not isinstance(req, dict):
                        raise ValueError("body must be a JSON object")
                    seed = int(req.get("seed", 0))
                    if not -2**63 <= seed < 2**63:
                        raise ValueError("seed out of int64 range")
                    label = req.get("label")
                    if not desc["conditional"]:
                        # non-conditional generators ignore label, so a
                        # junk value ("positive") must be dropped HERE:
                        # past this point it enters the SHARED batch,
                        # where np.asarray(int32) would 500 every
                        # co-batched request
                        label = 0
                    elif label is None:
                        label = 0
                    else:
                        label = int(label)
                        if not 0 <= label < desc["num_classes"]:
                            # XLA clamps out-of-range embedding gathers
                            # silently — a wrong-class image, not an error
                            raise ValueError(
                                f"label must be in "
                                f"[0, {desc['num_classes']})")
                except (ValueError, TypeError, json.JSONDecodeError) as e:
                    self._json(400, {"error": f"bad request body: {e}"})
                    return
                try:  # same keep-serving envelope as /predict: a device
                    # runtime failure must be a structured 500, not a
                    # dropped connection + per-request traceback.
                    # Concurrent requests coalesce into one batched
                    # dispatch; each row derives from ITS request's seed
                    # key, so responses are independent of batching.
                    img = batcher.submit((_key_data(seed), label))
                    buf = io.BytesIO()
                    Image.fromarray(img).save(buf, format="PNG")
                except Overloaded as e:  # backpressure: tell the client
                    self._json(503, {"error": str(e)}, retry_after=1)
                    return
                except TimeoutError as e:  # before OSError: subclass
                    self._json(503, {"error": str(e)})
                    return
                except Exception as e:  # noqa: BLE001 (no socket ops
                    # in this block, so nothing here shadows the outer
                    # OSError disconnect barrier)
                    self._json(500, {"error": f"generation failed: {e}"})
                    return
                png = buf.getvalue()
                self._code = 200
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)
                return
            self._json(404, {"error": f"unknown path for a {kind} model "
                                      "(classifiers serve /predict, "
                                      "generators /generate)"})

        def log_message(self, fmt, *a):  # quiet access log
            pass

    class Server(ThreadingHTTPServer):
        # socketserver's default listen backlog is 5; under concurrent
        # load on a busy host (1-core here, handler threads + device
        # dispatch competing for the GIL) the accept queue overflows and
        # Linux RSTs the overflow connections — clients see ECONNRESET
        # instead of queueing (observed with 16 clients on the TPU
        # backend). A deeper backlog just parks them until accept runs.
        request_queue_size = 128

    srv = Server((args.host, args.port), Handler)

    import signal
    sig_count = [0]

    def _drainer():
        deadline = time.time() + max(0.0, args.drain_grace)
        while time.time() < deadline:
            with active_lock:
                if active[0] == 0:
                    break
            time.sleep(0.05)
        srv.shutdown()

    def _on_signal(signum, frame):  # runs on the serve_forever thread:
        sig_count[0] += 1           # only set flags / spawn threads here
        # (srv.shutdown() from this frame would deadlock: it waits for
        # the serve loop this handler interrupted to notice the flag)
        if sig_count[0] == 1:
            draining.set()
            print("Draining: refusing new requests; waiting up to "
                  f"{args.drain_grace:.0f}s for in-flight ones "
                  "(signal again to stop now)", flush=True)
            threading.Thread(target=_drainer, daemon=True).start()
        else:
            threading.Thread(target=srv.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _on_signal)
        signal.signal(signal.SIGINT, _on_signal)
    except ValueError:
        pass  # not the main thread (in-process tests drive main() from
        # worker threads); drain stays reachable via KeyboardInterrupt

    print(f"Serving {model_name} ({kind}, image_size={size}) on "
          f"http://{args.host}:{srv.server_address[1]}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    srv.server_close()
    if draining.is_set():
        print("Drained; exiting.", flush=True)


if __name__ == "__main__":
    main()
