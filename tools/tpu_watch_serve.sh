#!/bin/bash
# Wait for a HEALTHY axon-tunnel window, then run the serve.py
# micro-batching A/B once (tools/bench_serve.py --write-detail).
#
# "Alive" is not enough: the tunnel can be up but congested (observed
# 2026-08-18 ~14:11-14:40+ — a cached compile took 100 s and an 8-byte
# result fetch 14.6 s, so every /predict round-trip blew the bench's
# 120 s client timeout). The probe therefore measures a tiny
# compile+execute+FETCH round-trip and requires it to finish fast.
#
# Usage: nohup bash tools/tpu_watch_serve.sh ARTIFACT &> /tmp/tpu_serve_watch.log &
set -u
ART="${1:-/tmp/clf224.stablehlo}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

probe() {
    # healthy = device visible AND a tiny program round-trips in <25 s
    timeout 25 python -c "
import numpy as np, jax, jax.numpy as jnp
f = jax.jit(lambda x: (x.astype(jnp.float32) ** 2).sum())
print('probe ok:', np.asarray(f(np.ones((64, 64), np.uint8))))
" 2>/dev/null
}

for i in $(seq 1 100); do
    if probe; then
        echo "=== TPU HEALTHY $(date) — running serve A/B ==="
        timeout 580 python tools/bench_serve.py --model-path "$ART" \
            --max-batches 1,8 --write-detail
        rc=$?
        echo "--- bench_serve exit=$rc $(date) ---"
        # client timeouts/resets mean the window closed mid-run: retry
        # on the next healthy probe instead of giving up
        if [ "$rc" -eq 0 ]; then
            touch /tmp/tpu_serve_watch.done
            echo "=== DONE $(date) ==="
            exit 0
        fi
    else
        echo "probe unhealthy $(date)"
    fi
    sleep 300
done
echo "=== gave up after 100 probes $(date) ==="
