#!/bin/bash
# Mid-run rotation watcher (round-5 flagship run): run the oracle
# rotation eval on every NEW snapshot the chunked trainer writes, so
# rotation convergence is observable DURING the run — the acceptance
# signal for the fixed ADD gradient is mean nonsym rotation error
# dropping well below the ~131 deg plateau of the broken-gradient r3
# run. The tunneled chip multiplexes processes, so this coexists with
# the trainer (verified r3, finish_round_r3.sh header).
#   setsid nohup bash experiments/watch_rotation_r5.sh output/lov_syn_r5p \
#       > experiments/logs/watch_rotation_r4.log 2>&1 &
set -u
OUT=${1:-output/lov_syn_r5p}
PREFIX=vgg16_fcn_color_single_frame_2d_pose_add_lov
last=0
while true; do
  newest=$(ls "$OUT"/${PREFIX}_iter_*.npz 2>/dev/null \
    | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
  newest=${newest:-0}
  if [ "$newest" -gt "$last" ]; then
    echo "=== [$(date +%T)] oracle rotation eval @ iter $newest ==="
    timeout 900 python experiments/eval_rotation_oracle.py \
      --ckpt "$OUT/${PREFIX}_iter_${newest}.npz" \
      --num_images 12 --seed 4242 \
      --out "output/r5p_rot_oracle_${newest}.json"
    rc=$?
    echo "rc=$rc"
    [ $rc -eq 0 ] && python - "output/r5p_rot_oracle_${newest}.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print("summary:", {k: d[k] for k in d if not isinstance(d[k], (dict, list))})
EOF
    last=$newest
  fi
  [ "$newest" -ge 40000 ] && break
  sleep 45
done
