#!/bin/bash
# One-shot TPU measurement session (run when the axon relay is healthy).
# Usage: bash scripts/tpu_session.sh [outdir]
# Runs, in order, each under its own timeout:
#   1. Pallas kernel verification (compiled, incl. fused_projection_best2)
#   2. Track-kernel profile (schedules x modes, assoc slabs, pose_opt)
#   3. bench.py A/B: default vs plm schedule vs batched stereo extract
#   4. Distributed-BA scaling TPU row
set -u
OUT=${1:-/tmp/tpu_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}

echo "== 0. relay probe =="
timeout 60 python -u -c "import jax; print(jax.devices())" \
    > "$OUT/probe.log" 2>&1 || { echo "RELAY DOWN"; exit 1; }
cat "$OUT/probe.log" | grep -v WARNING

echo "== 1. pallas verify =="
timeout 500 python -u examples/verify_pallas_tpu.py \
    > "$OUT/pallas.log" 2>&1
tail -12 "$OUT/pallas.log"

echo "== 2. track profile =="
timeout 580 python -u scripts/profile_track.py \
    > "$OUT/profile.log" 2>&1
grep -v WARNING "$OUT/profile.log"

echo "== 3. bench A/B =="
for cfg in "default:" \
           "plm2212:BENCH_SCHEDULE=2,2,1,2 BENCH_OPT_MODE=plm" \
           "batch:BENCH_BATCH_STEREO=1" \
           "plm_batch:BENCH_SCHEDULE=2,2,1,2 BENCH_OPT_MODE=plm BENCH_BATCH_STEREO=1"; do
    name="${cfg%%:*}"; envs="${cfg#*:}"
    echo "-- bench[$name] $envs"
    env $envs timeout 580 python -u bench.py \
        > "$OUT/bench_$name.log" 2>&1
    grep -v WARNING "$OUT/bench_$name.log" | tail -1
done

echo "== 4. scaling TPU row =="
timeout 580 python -u scripts/scaling_bench.py \
    > "$OUT/scaling.log" 2>&1
tail -5 "$OUT/scaling.log"

echo "== done: logs in $OUT =="
