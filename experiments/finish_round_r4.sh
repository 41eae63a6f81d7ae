#!/bin/bash
# Round-4 end-of-round orchestrator (successor of finish_round_r3.sh):
# stop the retrain at STOP_AT (epoch seconds), then collect evidence on
# whatever snapshot was reached. Changes vs r3:
#   - oracle rotation eval of the final snapshot joins phase A (the
#     acceptance gate for the fixed ADD gradient),
#   - bench.py and serve --bench run ALONE at the end (single-tenant:
#     r3's serve numbers were contended; runbook step 3),
#   - no LINEMOD mini (path proven in r3; chip time goes to the
#     flagship + single-tenant benches).
# Run detached:
#   setsid nohup bash experiments/finish_round_r4.sh <stop_at_epoch> \
#       > experiments/logs/finish_round_r4.log 2>&1 &
set -u
STOP_AT=${1:?epoch seconds to stop training}
OUT=${2:-output/lov_syn_r4}
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
# stop the rotation watcher the same exact-pid way
if [ -f /tmp/watch_rotation_r4.pid ]; then
  kill -- "-$(cat /tmp/watch_rotation_r4.pid)" 2>/dev/null || true
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
  --output "output/r4_eval_syn_${newest}" \
  > experiments/logs/r4_eval_final.log 2>&1 &
EV=$!
timeout 900 python experiments/eval_rotation_oracle.py \
  --ckpt "$FINAL" --num_images 20 --seed 4242 \
  --out "output/r4_rot_oracle_final_${newest}.json" \
  > experiments/logs/r4_rot_oracle_final.log 2>&1 &
RO=$!
wait $EV; echo "final eval rc=$?"; tail -6 experiments/logs/r4_eval_final.log
wait $RO; echo "rot oracle rc=$?"; tail -2 experiments/logs/r4_rot_oracle_final.log

echo "=== [$(date +%T)] phase B: ICP eval || demo ==="
timeout 900 python -m posecnn_tpu.cli.test_net \
  --dataset synthetic --data_root /root/reference/data/LOV \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --ckpt "$FINAL" --num_images 30 --seed 4242 --refine \
  --output "output/r4_eval_syn_${newest}_icp" \
  > experiments/logs/r4_eval_icp.log 2>&1 &
EV=$!
timeout 900 python -m posecnn_tpu.cli.demo \
  --images /root/reference/data/demo_images \
  --ckpt "$FINAL" --refine --output output/r4_demo \
  > experiments/logs/r4_demo.log 2>&1 &
DM=$!
wait $EV; echo "icp eval rc=$?"; tail -6 experiments/logs/r4_eval_icp.log
wait $DM; echo "demo rc=$?"; tail -4 experiments/logs/r4_demo.log

echo "=== [$(date +%T)] phase C: validate_tpu (alone) ==="
timeout 900 python experiments/validate_tpu.py \
  > experiments/logs/r4_validate_tpu.log 2>&1
echo "validate rc=$?"; tail -2 experiments/logs/r4_validate_tpu.log

echo "=== [$(date +%T)] phase D: bench.py SINGLE-TENANT ==="
timeout 900 python bench.py > experiments/logs/r4_bench.log 2>&1
echo "bench rc=$?"; tail -1 experiments/logs/r4_bench.log

echo "=== [$(date +%T)] phase E: serve --bench SINGLE-TENANT ==="
timeout 900 python -m posecnn_tpu.cli.serve --ckpt "$FINAL" \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --data_root /root/reference/data/LOV --bench 50 \
  > experiments/logs/r4_serve_bench.log 2>&1
echo "serve bench rc=$?"; tail -3 experiments/logs/r4_serve_bench.log

echo "=== [$(date +%T)] phase F: serve --bench micro-batched (batch=4) ==="
# the new tunnel-amortizing path: throughput should approach
# batch/RTT vs the ~5 req/s of one-dispatch-per-request serving
timeout 900 python -m posecnn_tpu.cli.serve --ckpt "$FINAL" \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --data_root /root/reference/data/LOV --bench 48 \
  --batch 4 --batch_wait_ms 30 \
  > experiments/logs/r4_serve_bench_b4.log 2>&1
echo "serve batched bench rc=$?"; tail -3 experiments/logs/r4_serve_bench_b4.log

echo "=== [$(date +%T)] finish_round_r4 done ==="
