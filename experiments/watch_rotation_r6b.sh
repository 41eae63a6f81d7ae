#!/bin/bash
# Round-6 rotation watcher, revision b: oracle rotation eval on NEW
# snapshots, producing the convergence curve (r4 verdict task 2's
# "Done" evidence).  Differences from watch_rotation_r6.sh:
#   - phase-A (half-scale) cadence thinned to every 8k iters: each
#     point costs ~2 min on the shared chip and the wall-clock budget
#     this session must also fit phase B + the full eval suite;
#   - every phase-B (full-scale) snapshot is evaluated (there will
#     only be ~3 and they are the headline);
#   - each point is committed to docs/artifacts/r6/ immediately, so a
#     session/machine reset cannot lose the curve again (the previous
#     session lost all of output/ exactly this way).
#   setsid nohup bash experiments/watch_rotation_r6b.sh \
#       > experiments/logs/watch_rotation_r6.log 2>&1 &
set -u
export PATH=/opt/venv/bin:$PATH
cd /root/repo
PREFIX=vgg16_fcn_color_single_frame_2d_pose_add_lov
declare -A seen
while true; do
  for spec in "output/lov_syn_r6a:0.5:8000" "output/lov_syn_r6b:1.0:2000"; do
    OUT=$(echo "$spec" | cut -d: -f1)
    SCALE=$(echo "$spec" | cut -d: -f2)
    CAD=$(echo "$spec" | cut -d: -f3)
    for f in "$OUT"/${PREFIX}_iter_*.npz; do
      [ -e "$f" ] || continue
      it=$(echo "$f" | sed -E 's/.*_iter_([0-9]+)\.npz/\1/')
      key="$OUT/$it"
      [ -n "${seen[$key]:-}" ] && continue
      if [ $((it % CAD)) -ne 0 ]; then
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
      if [ -f "output/r6_rot_oracle_${it}_s${SCALE}.json" ]; then
        mkdir -p docs/artifacts/r6
        cp "output/r6_rot_oracle_${it}_s${SCALE}.json" docs/artifacts/r6/
        git add docs/artifacts/r6/"r6_rot_oracle_${it}_s${SCALE}.json" \
          && git commit -q -m "r6 oracle curve point: iter ${it} scale ${SCALE}" || true
      fi
    done
  done
  newest_b=$(ls output/lov_syn_r6b/${PREFIX}_iter_*.npz 2>/dev/null \
    | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
  [ "${newest_b:-0}" -ge 68000 ] && break
  sleep 60
done
echo "watcher done at $(date)"
