#!/bin/bash
# Chunked training driver: the axon tunnel's PJRT client leaks host
# memory proportional to host→device transfer volume (~12 MB/iter at
# the 480×640 batch-2 sparse feed — confirmed no-leak on the CPU
# backend, experiments/logs/leak_probe notes), so a single process
# gets OOM-killed by the kernel around iter ~10.7k (this also explains
# round 1's "abandoned" 24k run). Run training in bounded chunks:
# each pass resumes from the newest snapshot and exits (or dies) after
# at most --iters; the loop continues until the target snapshot
# exists. Snapshot cadence bounds work lost per OOM kill.
#   setsid nohup bash experiments/train_chunked.sh <target_iter> <out_dir> \
#       > experiments/logs/train_chunked.log 2>&1 &
set -u
TARGET=${1:-30000}
OUT=${2:-output/lov_syn_r3}
mkdir -p "$OUT"
# exact-PID handle for orchestrators (setsid makes us the pgid leader:
# kill -- -$(cat $OUT/driver.pid) stops the driver AND the trainer)
echo $$ > "$OUT/driver.pid"
# STEPSIZE env var overrides the LR staircase step (default 20000)
PREFIX=vgg16_fcn_color_single_frame_2d_pose_add_lov
MAX_PASSES=12

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
  # BACKGROUNDS env var selects the composite pool glob. Default is the
  # procedural pool (experiments/gen_backgrounds.py) — NOT the 5 demo
  # frames: those must stay held out (r3 background-memorization
  # regression, docs/BENCH_NOTES.md).
  # CFG env var selects the recipe yaml (default: the reference-shaped
  # lov_color_2d; the r5+ flagship uses lov_color_2d_pool.yaml).
  # SEED_CKPT: used as --ckpt ONLY while OUT has no snapshots yet
  # (cross-phase warm start, e.g. full-scale fine-tune from the
  # half-scale run); once this phase snapshots, --resume wins.
  seed_args=()
  if [ -n "${SEED_CKPT:-}" ] && [ "$newest" -eq 0 ]; then
    seed_args=(--ckpt "$SEED_CKPT")
  fi
  # PASS_CAP: bound each pass to N iters so every pass boundary resets
  # the adam moments (fresh opt.init on resume). NOT just leak hygiene:
  # the r5p flagship's pose loss sat at chance for 7.5k iters and
  # inflected IMMEDIATELY after its first (accidental, OOM-forced)
  # restart; the r6a run with the leak fixed ran 26k iters restart-free
  # and never inflected. The periodic moment reset is a warm-restart
  # kick the recipe has implicitly depended on.
  pass_target=$TARGET
  if [ "${PASS_CAP:-0}" -gt 0 ]; then
    pass_target=$((newest + PASS_CAP))
    [ "$pass_target" -gt "$TARGET" ] && pass_target=$TARGET
  fi
  python -m posecnn_tpu.cli.train_net \
    --dataset synthetic --data_root /root/reference/data/LOV \
    --cfg "${CFG:-experiments/cfgs/lov_color_2d.yaml}" \
    --iters "$pass_target" --output "$OUT" --resume "${seed_args[@]}" \
    --backgrounds "${BACKGROUNDS:-output/bg_pool/*.png}" \
    --set train.stepsize="${STEPSIZE:-20000}" train.snapshot_iters=2000 train.max_host_rss_gb=100 \
         train.gt_pose_rois="${GT_POSE_ROIS:-False}" &
  tpid=$!
  start_ts=$(date +%s)
  # stall watchdog: the tunnel occasionally wedges a device call
  # forever (observed: 13 min silent at iter 14.5k, process S-state);
  # kill the pass when the metrics log goes stale so --resume retries.
  # Compile produces no metrics — allow 25 min before the first write.
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
  wait "$tpid"
  rc=$?
  echo "pass $pass exited rc=$rc at $(date)"
done
ls -la "$OUT" | tail -6
if [ "$reached" -ne 1 ]; then
  echo "FAILED: target iter $TARGET never reached" >&2
  exit 1
fi
