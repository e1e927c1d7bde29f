#!/bin/bash
# TPU-tunnel recovery watcher (round 3 queue — see CLAUDE.md "Pending TPU
# validation"). The axon tunnel dies for hours at a time and a dead tunnel
# HANGS backend init instead of raising, so liveness is probed in a
# killable subprocess. When a probe succeeds this runs the queued
# validations once, appending everything to $LOG, then exits.
#
#   nohup bash tools/tpu_watch.sh & echo $! > /tmp/tpu_watch.pid
#
# Queue:
#   1. exported-classifier inference bf16/f32 A/B  (bench_all --only ...)
#   2. serve.py micro-batching A/B on TPU          (bench_serve)
#   3. one sampler drive with --compute-dtype auto (generate_synthetic)
#   4. python bench.py sanity (headline ~91k imgs/s expected)
set -u
LOG=${LOG:-/tmp/tpu_recovery.log}
cd /root/repo

probe() {
  timeout 150 python -c '
import jax
d = jax.devices()
assert d[0].platform != "cpu", d
print("TPU devices:", d)'
}

run() {  # run <seconds> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "--- $name: $* ($(date -u +%H:%M:%S)) ---" >>"$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "--- $name exit=$? ($(date -u +%H:%M:%S)) ---" >>"$LOG"
}

while true; do
  if probe >>"$LOG" 2>&1; then
    echo "=== TPU ALIVE $(date -u) — running queued validations ===" >>"$LOG"

    run 3600 bench_all python tools/bench_all.py --only \
      exported_resnet50_infer_224px_b128,exported_resnet50_infer_224px_b128_f32

    run 1200 export_artifact python -c '
import jax, jax.numpy as jnp
from xgan.io_.export import export_classifier
from xgan.models.resnet import ResNet50
m = ResNet50(num_classes=2, dtype=jnp.bfloat16)
v = m.init(jax.random.key(0), jnp.zeros((2, 224, 224, 3)), train=False)
v = {"params": v["params"], "batch_stats": v["batch_stats"]}
open("/tmp/clf224.stablehlo", "wb").write(export_classifier(m, v, 224))
print("exported /tmp/clf224.stablehlo")'
    run 3600 bench_serve python tools/bench_serve.py \
      --model-path /tmp/clf224.stablehlo --max-batches 1,8

    run 600 make_gen_ckpt python -c '
import jax, jax.numpy as jnp
from xgan.models import dcgan
from xgan.io_.checkpoint import save_variables
jax.config.update("jax_platforms", "cpu")
m = dcgan.Generator(image_size=224)
v = m.init(jax.random.key(0), jnp.zeros((2, 100)), train=False)
save_variables("/tmp/gen224.msgpack",
               {"params": v["params"], "batch_stats": v["batch_stats"]})
print("saved /tmp/gen224.msgpack")'
    run 1800 sampler python src/generate_synthetic.py \
      --model-path /tmp/gen224.msgpack --output-dir /tmp/tpu_sampler_out \
      --num-images 128 --batch-size 64

    run 3600 bench_headline python bench.py

    echo "=== QUEUE DONE $(date -u) ===" >>"$LOG"
    touch /tmp/tpu_watch.done
    exit 0
  fi
  echo "probe: tunnel dead $(date -u)" >>"$LOG"
  sleep 600
done
