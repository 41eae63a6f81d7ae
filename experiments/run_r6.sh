#!/bin/bash
# Round-6 flagship master run (VERDICT r4 tasks 1+2): two-phase
# training to 60k iters, full-resolution at the end.
#   phase A: proven half-scale pool recipe (lov_color_2d_pool.yaml)
#            0 -> 48k, lr 3e-4 with one staircase decay at 40k;
#   phase B: full-scale (640x480) fine-tune (lov_color_2d_pool_full)
#            48k -> 60k at effective lr 1e-4, warm-started from the
#            newest phase-A snapshot (SEED_CKPT).
# Run detached:
#   setsid nohup bash experiments/run_r6.sh \
#       > experiments/logs/run_r6.log 2>&1 &
set -u
export PATH=/opt/venv/bin:$PATH
cd /root/repo
PREFIX=vgg16_fcn_color_single_frame_2d_pose_add_lov
A_OUT=output/lov_syn_r6a
B_OUT=output/lov_syn_r6b
echo $$ > output/run_r6.pid

# Revised mid-round (r6 rotation forensics): the pose loss needs the
# full 3e-4 phase to descend from its late (38k) restart-kick escape,
# so phase A extends to 58k with the decay boundary at 52k; phase B
# fine-tunes at full scale 58k->68k at 1e-4 (STEPSIZE 34000: the
# offset-aligned staircase puts 1e-4 across exactly that window).
echo "=== [$(date +%T)] phase A: half-scale ->58k ==="
CFG=experiments/cfgs/lov_color_2d_pool_b16.yaml STEPSIZE=52000 \
GT_POSE_ROIS=True PASS_CAP=6000 \
  bash experiments/train_chunked.sh 58000 "$A_OUT"
rc=$?
newest=$(ls "$A_OUT"/${PREFIX}_iter_*.npz 2>/dev/null \
  | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
echo "phase A done rc=$rc newest=$newest at $(date)"
if [ -z "$newest" ]; then
  echo "FATAL: phase A produced no snapshot" >&2
  exit 1
fi

echo "=== [$(date +%T)] phase B: full-scale ${newest}->68k ==="
CFG=experiments/cfgs/lov_color_2d_pool_full.yaml STEPSIZE=34000 \
GT_POSE_ROIS=True PASS_CAP=6000 SEED_CKPT="$A_OUT/${PREFIX}_iter_${newest}.npz" \
  bash experiments/train_chunked.sh 68000 "$B_OUT"
rc=$?
echo "phase B done rc=$rc at $(date)"
ls -la "$B_OUT" | tail -4
