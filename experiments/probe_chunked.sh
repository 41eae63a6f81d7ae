#!/bin/bash
# Generic chunked training driver (parameterized variant of
# train_chunked.sh — same host-leak + tunnel-stall mitigation, any
# config). Used for the round-5 properly-powered rotation probe
# (VERDICT r4 task 1: >=15-20k iters, lr sustained >=10k).
#   CFG=experiments/cfgs/rot_probe.yaml PREFIX=rot_probe \
#   STEPSIZE=12000 setsid nohup bash experiments/probe_chunked.sh \
#       20000 output/rot_probe_r5 > experiments/logs/rot_probe_r5.log 2>&1 &
set -u
TARGET=${1:-20000}
OUT=${2:-output/rot_probe_r5}
CFG=${CFG:-experiments/cfgs/rot_probe.yaml}
PREFIX=${PREFIX:-rot_probe}
mkdir -p "$OUT"
echo $$ > "$OUT/driver.pid"
MAX_PASSES=${MAX_PASSES:-12}

reached=0
for pass in $(seq 1 $MAX_PASSES); do
  newest=$(ls "$OUT"/${PREFIX}_iter_*.npz 2>/dev/null \
    | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
  newest=${newest:-0}
  echo "=== pass $pass: newest snapshot iter=$newest target=$TARGET ==="
  if [ "$newest" -ge "$TARGET" ]; then
    echo "target reached"
    reached=1
    break
  fi
  python -m posecnn_tpu.cli.train_net \
    --dataset synthetic --data_root /root/reference/data/LOV \
    --cfg "$CFG" \
    --iters "$TARGET" --output "$OUT" --resume \
    --backgrounds "${BACKGROUNDS:-output/bg_pool/*.png}" \
    --set train.stepsize="${STEPSIZE:-12000}" \
         train.snapshot_iters="${SNAPSHOT_ITERS:-2000}" \
         train.max_iters="$TARGET" train.max_host_rss_gb=100 &
  tpid=$!
  start_ts=$(date +%s)
  while kill -0 "$tpid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$OUT/metrics.jsonl" 2>/dev/null || echo 0)
    if [ "$mt" -gt "$start_ts" ]; then
      [ $((now - mt)) -gt 420 ] && { echo "stall: metrics stale $((now-mt))s, killing $tpid"; kill -9 "$tpid"; }
    else
      [ $((now - start_ts)) -gt 1500 ] && { echo "stall: no metrics $((now-start_ts))s after start, killing $tpid"; kill -9 "$tpid"; }
    fi
  done
  wait "$tpid" 2>/dev/null
  echo "pass $pass exited rc=$?"
done
[ "$reached" -eq 1 ] || echo "WARNING: target not reached after $MAX_PASSES passes"
