#!/bin/bash
# Round-6 end-of-round orchestrator, revision b. Same evidence set as
# finish_round_r6.sh but hardened against the failure mode that cost
# the previous session its entire evidence set (machine reset wiped
# output/ before anything was committed):
#   - headline phases run FIRST (full-scale eval, powered oracle, ICP,
#     demo, serve) and guard/bench phases last;
#   - after EVERY phase the artifacts produced so far are copied into
#     docs/artifacts/r6/ and committed immediately.
# Run detached:
#   TARGET_B=64000 setsid nohup bash experiments/finish_round_r6b.sh <stop_at_epoch> \
#       > experiments/logs/finish_round_r6.log 2>&1 &
set -u
export PATH=/opt/venv/bin:$PATH
cd /root/repo
STOP_AT=${1:?epoch seconds to stop training}
B_OUT=${2:-output/lov_syn_r6b}
A_OUT=output/lov_syn_r6a
TARGET_B=${TARGET_B:-64000}
PREFIX=vgg16_fcn_color_single_frame_2d_pose_add_lov

save() {
  bash experiments/collect_artifacts.sh r6 >/dev/null 2>&1 || true
  git add -A docs/artifacts/r6 2>/dev/null
  git commit -q -m "r6 artifacts: $1" || true
}

while [ "$(date +%s)" -lt "$STOP_AT" ]; do
  newest=$(ls "$B_OUT"/${PREFIX}_iter_*.npz 2>/dev/null \
    | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
  [ "${newest:-0}" -ge "$TARGET_B" ] && break
  sleep 30
done

for pf in output/run_r6.pid output/run_r6c.pid; do
  if [ -f "$pf" ]; then
    pgid=$(cat "$pf")
    echo "stopping trainer pgid $pgid ($pf) at $(date)"
    kill -- "-$pgid" 2>/dev/null || true
    sleep 5
    kill -9 -- "-$pgid" 2>/dev/null || true
  fi
done

newest=$(ls "$B_OUT"/${PREFIX}_iter_*.npz 2>/dev/null \
  | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
FINAL="$B_OUT/${PREFIX}_iter_${newest}.npz"
# fall back to the half-scale phase-A checkpoint if B never snapshot
if [ -z "${newest:-}" ]; then
  newest=$(ls "$A_OUT"/${PREFIX}_iter_*.npz | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
  FINAL="$A_OUT/${PREFIX}_iter_${newest}.npz"
  echo "WARNING: no phase-B snapshot; evaluating phase A at $newest"
fi
echo "final checkpoint: $FINAL"
# (the 539 MB snapshot itself is too large to commit; the committed
# insurance is the eval artifacts + metrics.jsonl after each phase)
mkdir -p docs/artifacts/r6

echo "=== [$(date +%T)] phase A: FULL-SCALE eval n=128 (per-class table) ==="
timeout 3600 python -m posecnn_tpu.cli.test_net \
  --dataset synthetic --data_root /root/reference/data/LOV \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --ckpt "$FINAL" --num_images 128 --seed 4242 \
  --output "output/r6_eval_full_${newest}" \
  > experiments/logs/r6_eval_full.log 2>&1
echo "full eval rc=$?"; grep -A40 "class " experiments/logs/r6_eval_full.log | tail -32
save "full-scale eval n=128 at iter ${newest}"

echo "=== [$(date +%T)] phase B: rotation oracle n=128 (full scale) ==="
timeout 3600 python experiments/eval_rotation_oracle.py \
  --ckpt "$FINAL" --num_images 128 --seed 4242 --scale 1.0 \
  --out "output/r6_rot_oracle_final_${newest}.json" \
  > experiments/logs/r6_rot_oracle_final.log 2>&1
echo "oracle rc=$?"; tail -2 experiments/logs/r6_rot_oracle_final.log
save "powered rotation oracle n=128 at iter ${newest}"

echo "=== [$(date +%T)] phase C: ICP eval (full scale, n=64) || demo ==="
timeout 3600 python -m posecnn_tpu.cli.test_net \
  --dataset synthetic --data_root /root/reference/data/LOV \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --ckpt "$FINAL" --num_images 64 --seed 4242 --refine \
  --output "output/r6_eval_full_${newest}_icp" \
  > experiments/logs/r6_eval_icp.log 2>&1 &
EV=$!
timeout 1800 python -m posecnn_tpu.cli.demo \
  --images /root/reference/data/demo_images \
  --ckpt "$FINAL" --refine --output output/r6_demo \
  > experiments/logs/r6_demo.log 2>&1 &
DM=$!
wait $EV; echo "icp eval rc=$?"; tail -6 experiments/logs/r6_eval_icp.log
wait $DM; echo "demo rc=$?"; tail -4 experiments/logs/r6_demo.log
save "full-scale ICP eval + demo at iter ${newest}"

echo "=== [$(date +%T)] phase D: serve --bench b1/b8 (full-scale ckpt) ==="
timeout 1200 python -m posecnn_tpu.cli.serve --ckpt "$FINAL" \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --data_root /root/reference/data/LOV --bench 50 \
  > experiments/logs/r6_serve_bench_b1.log 2>&1
echo "serve b1 rc=$?"; tail -1 experiments/logs/r6_serve_bench_b1.log
timeout 1200 python -m posecnn_tpu.cli.serve --ckpt "$FINAL" \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --data_root /root/reference/data/LOV --bench 48 \
  --batch 8 --batch_wait_ms 30 --concurrency 16 \
  > experiments/logs/r6_serve_bench_b8.log 2>&1
echo "serve b8 rc=$?"; tail -1 experiments/logs/r6_serve_bench_b8.log
save "serve bench b1/b8 on full-scale checkpoint"

# phase E (validate_tpu) dropped: ran clean during the prewarm batch
# (output/validate_tpu.json pass=1, committed with the phase saves)

echo "=== [$(date +%T)] phase G: device-only train MFU sweep (alone) ==="
timeout 3600 python experiments/bench_train_mfu.py \
  > experiments/logs/r6_bench_train_mfu.log 2>&1
echo "mfu rc=$?"; tail -4 experiments/logs/r6_bench_train_mfu.log
save "device-only train MFU sweep"

echo "=== [$(date +%T)] phase F: hough graph phases (c2f batched, clean) ==="
timeout 1800 python experiments/bench_graph_phases.py \
  > experiments/logs/r6_bench_graph_phases.log 2>&1
echo "graph phases rc=$?"; tail -3 experiments/logs/r6_bench_graph_phases.log
save "hough/serving graph phase breakdown"

echo "=== [$(date +%T)] phase H: bench.py SINGLE-TENANT ==="
timeout 1800 python bench.py > experiments/logs/r6_bench.log 2>&1
echo "bench rc=$?"; tail -1 experiments/logs/r6_bench.log

echo "=== [$(date +%T)] phase I: overfit guard ==="
timeout 900 python experiments/probe_overfit_pose.py \
  --iters 400 --sweep "adam:0.0003" --assert_below 15 \
  --out output/r6_overfit_guard.json \
  > experiments/logs/r6_overfit_guard.log 2>&1
echo "overfit guard rc=$?"; tail -2 experiments/logs/r6_overfit_guard.log
save "single-tenant bench + overfit guard"

echo "=== [$(date +%T)] finish_round_r6b done ==="
