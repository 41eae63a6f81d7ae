#!/bin/bash
# Round-3 end-of-round orchestrator (replaces run_after_train_r3.sh's
# wait-for-target): the round has a hard wall-clock end, so training
# runs until STOP_AT (epoch seconds), then the post-train evidence
# pipeline runs on whatever snapshot was reached. The tunneled chip
# MULTIPLEXES across processes (verified: a probe matmul ran alongside
# the trainer without disturbing it), so independent steps run in
# pairs to halve wall time. Sequence:
#   1. stop the chunked trainer at the deadline (exact pgid from
#      $OUT/driver.pid — never pattern kills),
#   A. held-out synthetic eval of newest snapshot (30 imgs, the
#      r2-comparable protocol)  ∥  on-chip kernel validation,
#   B. same eval WITH --refine (ICP delta, r2 task 5)  ∥  serving
#      HTTP latency bench (r2 task 8),
#   C. real-frame demo with ICP  ∥  train-step compaction bench
#      (r2 task 2),
#   D. LINEMOD eggbox mini-run (train 4k + eval; r2 task 6).
# Run detached:
#   setsid nohup bash experiments/finish_round_r3.sh <stop_at_epoch> \
#       > experiments/logs/finish_round_r3.log 2>&1 &
set -u
STOP_AT=${1:?epoch seconds to stop training}
OUT=${2:-output/lov_syn_r3}
PREFIX=vgg16_fcn_color_single_frame_2d_pose_add_lov

while [ "$(date +%s)" -lt "$STOP_AT" ]; do
  newest=$(ls "$OUT"/${PREFIX}_iter_*.npz 2>/dev/null \
    | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
  [ "${newest:-0}" -ge 40000 ] && break
  sleep 30
done

if [ -f "$OUT/driver.pid" ]; then
  pgid=$(cat "$OUT/driver.pid")
  echo "deadline: stopping trainer pgid $pgid at $(date)"
  kill -- "-$pgid" 2>/dev/null || true
  sleep 5
  kill -9 -- "-$pgid" 2>/dev/null || true
fi

newest=$(ls "$OUT"/${PREFIX}_iter_*.npz 2>/dev/null \
  | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
echo "training stopped; newest snapshot iter=$newest"
FINAL="$OUT/${PREFIX}_iter_${newest}.npz"

echo "=== [$(date +%T)] phase A: final eval ∥ kernel validation ==="
python -m posecnn_tpu.cli.test_net \
  --dataset synthetic --data_root /root/reference/data/LOV \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --ckpt "$FINAL" --num_images 30 --seed 4242 \
  --output "output/r3_eval_syn_${newest}" \
  > experiments/logs/r3_eval_final.log 2>&1 &
EV=$!
python experiments/validate_tpu.py \
  > experiments/logs/r3_validate_tpu.log 2>&1 &
VA=$!
wait $EV; echo "final eval rc=$?"; tail -6 experiments/logs/r3_eval_final.log
wait $VA; echo "validate rc=$?"; tail -2 experiments/logs/r3_validate_tpu.log

echo "=== [$(date +%T)] phase B: ICP eval ∥ serve bench ==="
python -m posecnn_tpu.cli.test_net \
  --dataset synthetic --data_root /root/reference/data/LOV \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --ckpt "$FINAL" --num_images 30 --seed 4242 --refine \
  --output output/r3_eval_syn_final_icp \
  > experiments/logs/r3_eval_icp.log 2>&1 &
EV=$!
python -m posecnn_tpu.cli.serve --ckpt "$FINAL" \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --data_root /root/reference/data/LOV --bench 50 \
  > experiments/logs/r3_serve_bench.log 2>&1 &
SB=$!
wait $EV; echo "icp eval rc=$?"; tail -6 experiments/logs/r3_eval_icp.log
wait $SB; echo "serve bench rc=$?"; tail -3 experiments/logs/r3_serve_bench.log

echo "=== [$(date +%T)] phase C: demo ∥ compaction bench ==="
python -m posecnn_tpu.cli.demo \
  --images /root/reference/data/demo_images \
  --ckpt "$FINAL" --refine --output output/r3_demo \
  > experiments/logs/r3_demo.log 2>&1 &
DM=$!
python experiments/bench_train_components.py \
  > experiments/logs/r3_btc.log 2>&1 &
BT=$!
wait $DM; echo "demo rc=$?"; tail -6 experiments/logs/r3_demo.log
wait $BT; echo "btc rc=$?"; tail -3 experiments/logs/r3_btc.log

echo "=== [$(date +%T)] phase D: LINEMOD eggbox mini e2e ==="
python -m posecnn_tpu.cli.train_net \
  --dataset linemod --data_root /root/reference/data/LINEMOD --cls eggbox \
  --cfg experiments/cfgs/linemod_ape_pose.yaml \
  --iters 3000 --output output/linemod_eggbox_r3 \
  --set train.stepsize=2400 train.snapshot_iters=3000 train.display=40 \
       train.syn_width=320 train.syn_height=240 train.num_units=32 \
       train.gt_pose_rois=True \
       train.snapshot_prefix=posecnn_linemod_eggbox 2>&1 | tail -4
python -m posecnn_tpu.cli.test_net \
  --dataset linemod --data_root /root/reference/data/LINEMOD --cls eggbox \
  --cfg experiments/cfgs/linemod_ape_pose.yaml \
  --ckpt output/linemod_eggbox_r3/posecnn_linemod_eggbox_iter_3000.npz \
  --num_images 20 --seed 4242 --output output/linemod_eggbox_r3_eval \
  --set train.syn_width=320 train.syn_height=240 train.num_units=32 2>&1 | tail -12

echo "all done at $(date)"
