#!/bin/bash
# Round-5 end-of-round orchestrator (successor of finish_round_r4.sh):
# stop the flagship retrain at STOP_AT (epoch seconds), then collect
# evidence on whatever snapshot was reached. r5 additions:
#   - serve --bench batch=4 AND batch=8 single-tenant (VERDICT r4
#     task 5: measure the micro-batching, don't just ship it),
#   - train-step profile artifact (VERDICT r4 task 6),
#   - eval + oracle now composite the SAME background pool training
#     used (VERDICT r4 task 4) — defaults changed in the CLIs.
# Run detached:
#   setsid nohup bash experiments/finish_round_r5.sh <stop_at_epoch> \
#       > experiments/logs/finish_round_r5.log 2>&1 &
set -u
STOP_AT=${1:?epoch seconds to stop training}
OUT=${2:-output/lov_syn_r5}
PREFIX=vgg16_fcn_color_single_frame_2d_pose_add_lov

while [ "$(date +%s)" -lt "$STOP_AT" ]; do
  newest=$(ls "$OUT"/${PREFIX}_iter_*.npz 2>/dev/null \
    | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
  [ "${newest:-0}" -ge 40000 ] && break
  sleep 20
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

echo "=== [$(date +%T)] phase A: final eval || rotation oracle ==="
timeout 900 python -m posecnn_tpu.cli.test_net \
  --dataset synthetic --data_root /root/reference/data/LOV \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --ckpt "$FINAL" --num_images 30 --seed 4242 \
  --output "output/r5_eval_syn_${newest}" \
  > experiments/logs/r5_eval_final.log 2>&1 &
EV=$!
timeout 900 python experiments/eval_rotation_oracle.py \
  --ckpt "$FINAL" --num_images 20 --seed 4242 \
  --out "output/r5_rot_oracle_final_${newest}.json" \
  > experiments/logs/r5_rot_oracle_final.log 2>&1 &
RO=$!
wait $EV; echo "final eval rc=$?"; tail -6 experiments/logs/r5_eval_final.log
wait $RO; echo "rot oracle rc=$?"; tail -2 experiments/logs/r5_rot_oracle_final.log

echo "=== [$(date +%T)] phase B: ICP eval || demo ==="
timeout 900 python -m posecnn_tpu.cli.test_net \
  --dataset synthetic --data_root /root/reference/data/LOV \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --ckpt "$FINAL" --num_images 30 --seed 4242 --refine \
  --output "output/r5_eval_syn_${newest}_icp" \
  > experiments/logs/r5_eval_icp.log 2>&1 &
EV=$!
timeout 900 python -m posecnn_tpu.cli.demo \
  --images /root/reference/data/demo_images \
  --ckpt "$FINAL" --refine --output output/r5_demo \
  > experiments/logs/r5_demo.log 2>&1 &
DM=$!
wait $EV; echo "icp eval rc=$?"; tail -6 experiments/logs/r5_eval_icp.log
wait $DM; echo "demo rc=$?"; tail -4 experiments/logs/r5_demo.log

echo "=== [$(date +%T)] phase C: validate_tpu (alone) ==="
timeout 900 python experiments/validate_tpu.py \
  > experiments/logs/r5_validate_tpu.log 2>&1
echo "validate rc=$?"; tail -2 experiments/logs/r5_validate_tpu.log

echo "=== [$(date +%T)] phase C2: pose-overfit guard (alone) ==="
# per-round regression guard for the r5 root-cause fix (PARITY.md):
# the full end-to-end train path must still memorize a fixed 2-image
# batch's rotation to <15 deg
timeout 900 python experiments/probe_overfit_pose.py \
  --iters 400 --sweep "momentum:0.01" --assert_below 15 \
  --out output/r5_overfit_guard.json \
  > experiments/logs/r5_overfit_guard.log 2>&1
echo "overfit guard rc=$?"; tail -2 experiments/logs/r5_overfit_guard.log

echo "=== [$(date +%T)] phase D: train-step profile (alone) ==="
timeout 900 python experiments/profile_train.py \
  > experiments/logs/r5_profile_train.log 2>&1
echo "profile rc=$?"; tail -3 experiments/logs/r5_profile_train.log

echo "=== [$(date +%T)] phase E: bench.py SINGLE-TENANT ==="
timeout 900 python bench.py > experiments/logs/r5_bench.log 2>&1
echo "bench rc=$?"; tail -1 experiments/logs/r5_bench.log

echo "=== [$(date +%T)] phase F: serve --bench batch=1/4/8 SINGLE-TENANT ==="
timeout 900 python -m posecnn_tpu.cli.serve --ckpt "$FINAL" \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --data_root /root/reference/data/LOV --bench 50 \
  > experiments/logs/r5_serve_bench_b1.log 2>&1
echo "serve b1 rc=$?"; tail -1 experiments/logs/r5_serve_bench_b1.log
timeout 900 python -m posecnn_tpu.cli.serve --ckpt "$FINAL" \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --data_root /root/reference/data/LOV --bench 48 \
  --batch 4 --batch_wait_ms 30 --concurrency 8 \
  > experiments/logs/r5_serve_bench_b4.log 2>&1
echo "serve b4 rc=$?"; tail -1 experiments/logs/r5_serve_bench_b4.log
timeout 900 python -m posecnn_tpu.cli.serve --ckpt "$FINAL" \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --data_root /root/reference/data/LOV --bench 48 \
  --batch 8 --batch_wait_ms 30 --concurrency 16 \
  > experiments/logs/r5_serve_bench_b8.log 2>&1
echo "serve b8 rc=$?"; tail -1 experiments/logs/r5_serve_bench_b8.log

echo "=== [$(date +%T)] finish_round_r5 done ==="
