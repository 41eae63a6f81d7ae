#!/bin/bash
# Round-2 Phase B: everything that needs the real chip, run in
# priority order once the chunked training driver (pid $1) exits.
# Each step logs to experiments/logs/ and failures don't stop the
# sequence. Launch detached:
#   setsid nohup bash experiments/phase_b.sh <train_driver_pid> \
#       > experiments/logs/phase_b.log 2>&1 &
set -u
PID=${1:?train driver pid}
OUT=${2:-output/lov_syn_r2}
PREFIX=vgg16_fcn_color_single_frame_2d_pose_add_lov

echo "waiting for train driver pid $PID ..."
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "training driver done at $(date)"
ls -la "$OUT" | tail -4

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name (start $(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "experiments/logs/pb_${name}.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc ==="
  tail -5 "experiments/logs/pb_${name}.log"
}

# 1. kernel validation incl. the new multi-instance c2f parity+timing
run validate_tpu 3600 python experiments/validate_tpu.py

# 2. snapshot-curve evals (8k was evaluated mid-round by the watcher)
for IT in 16000 20000 24000 30000; do
  SNAP="$OUT/${PREFIX}_iter_${IT}.npz"
  if [ -f "$SNAP" ]; then
    run "eval_${IT}" 2400 python -m posecnn_tpu.cli.test_net \
      --dataset synthetic --data_root /root/reference/data/LOV \
      --cfg experiments/cfgs/lov_color_2d.yaml \
      --ckpt "$SNAP" --num_images 30 --seed 4242 \
      --output "output/eval_syn_${IT}"
  else
    echo "missing snapshot $SNAP"
  fi
done

# 3. real-frame demo with the final checkpoint (VERDICT r1 task 1)
FINAL=$(ls -t "$OUT"/${PREFIX}_iter_*.npz | head -1)
run demo 2400 python -m posecnn_tpu.cli.demo \
  --images /root/reference/data/demo_images \
  --ckpt "$FINAL" --refine --output output/demo

# 4. train-step cost attribution (VERDICT r1 task 5 groundwork)
run bench_train_components 3600 python experiments/bench_train_components.py

# 5. device profile of the train step (may be tunnel-limited)
run profile_train 1800 python experiments/profile_train.py

# 6. every trainable family on the real chip
run validate_families 3600 python experiments/validate_families.py

# 7. headline serving bench
run bench 1800 python bench.py

# 8. collect committed artifacts
bash experiments/collect_artifacts.sh r2
echo "phase B complete at $(date)"
