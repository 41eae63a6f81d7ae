#!/bin/bash
# Round-6 rotation watcher: oracle rotation eval on every NEW snapshot
# from phase A (output/lov_syn_r6a) and then phase B (output/lov_syn_r6b),
# producing the 0->60k convergence curve (r4 verdict task 2's "Done"
# evidence). n=24 held-out scenes per point (the FINAL eval runs at
# n>=128; this is the curve, not the headline). Oracle evaluates at
# the snapshot's own trained scale via --scale.
#   setsid nohup bash experiments/watch_rotation_r6.sh \
#       > experiments/logs/watch_rotation_r6.log 2>&1 &
set -u
export PATH=/opt/venv/bin:$PATH
cd /root/repo
PREFIX=vgg16_fcn_color_single_frame_2d_pose_add_lov
declare -A seen
while true; do
  for spec in "output/lov_syn_r6a:0.5" "output/lov_syn_r6b:1.0"; do
    OUT=${spec%%:*}
    SCALE=${spec##*:}
    for f in "$OUT"/${PREFIX}_iter_*.npz; do
      [ -e "$f" ] || continue
      it=$(echo "$f" | sed -E 's/.*_iter_([0-9]+)\.npz/\1/')
      key="$OUT/$it"
      [ -n "${seen[$key]:-}" ] && continue
      # only every 4k iters: each oracle point costs ~2 min on the
      # shared chip; 2k-cadence would double-tax the trainer
      if [ $((it % 4000)) -ne 0 ] && [ "$it" -lt 66000 ]; then
        seen[$key]=1
        continue
      fi
      if [ -f "output/r6_rot_oracle_${it}_s${SCALE}.json" ]; then
        seen[$key]=1
        continue
      fi
      echo "=== [$(date +%T)] oracle @ $key scale=$SCALE ==="
      timeout 1200 python experiments/eval_rotation_oracle.py \
        --ckpt "$f" --num_images 24 --seed 4242 --scale "$SCALE" \
        --out "output/r6_rot_oracle_${it}_s${SCALE}.json" 2>&1 | tail -2
      seen[$key]=1
    done
  done
  newest_b=$(ls output/lov_syn_r6b/${PREFIX}_iter_*.npz 2>/dev/null \
    | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
  [ "${newest_b:-0}" -ge 68000 ] && break
  sleep 60
done
echo "watcher done at $(date)"
