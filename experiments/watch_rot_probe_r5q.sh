#!/bin/bash
# Per-snapshot oracle watcher for the round-5 powered rotation probe
# (VERDICT r4 task 1: oracle on >=64 held-out class-1 images every 2k).
#   setsid nohup bash experiments/watch_rot_probe_r5.sh output/rot_probe_r5 \
#       > experiments/logs/watch_rot_probe_r5.log 2>&1 &
set -u
OUT=${1:-output/rot_probe_r5}
TARGET=${2:-20000}
PREFIX=${PREFIX:-rot_probe}
last=0
while true; do
  newest=$(ls "$OUT"/${PREFIX}_iter_*.npz 2>/dev/null \
    | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
  newest=${newest:-0}
  if [ "$newest" -gt "$last" ]; then
    echo "=== [$(date +%T)] oracle @ iter $newest ==="
    timeout 1800 python experiments/eval_rotation_oracle.py \
      --ckpt "$OUT/${PREFIX}_iter_${newest}.npz" \
      --cfg experiments/cfgs/rot_probe_pool.yaml \
      --num_images 48 --scale 0.25 --seed 4242 \
      --out "output/r5q_rot_probe_oracle_${newest}.json"
    echo "rc=$?"
    last=$newest
  fi
  [ "$newest" -ge "$TARGET" ] && break
  sleep 60
done
echo "watcher done at iter $last"
