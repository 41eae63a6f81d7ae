#!/bin/bash
# Post-training pipeline: wait for the round-2 lov_syn_r2 run (pid $1),
# then evaluate the snapshot curve on held-out synthetic scenes, run
# the real-frame demo (VERDICT r1 tasks 1+2), and validate the Pallas
# kernels on the real chip. Run detached:
#   setsid nohup bash experiments/run_after_train.sh <train_pid> > experiments/logs/after_train.log 2>&1 &
set -u
PID=${1:?train pid}
OUT=${2:-output/lov_syn_r2}
PREFIX=vgg16_fcn_color_single_frame_2d_pose_add_lov

echo "waiting for train pid $PID ..."
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "training done at $(date)"
ls -la "$OUT"

for IT in 8000 16000 24000 30000; do
  SNAP="$OUT/${PREFIX}_iter_${IT}.npz"
  if [ -f "$SNAP" ]; then
    echo "=== eval @ $IT ==="
    python -m posecnn_tpu.cli.test_net \
      --dataset synthetic --data_root /root/reference/data/LOV \
      --cfg experiments/cfgs/lov_color_2d.yaml \
      --ckpt "$SNAP" --num_images 30 --seed 4242 \
      --output "output/eval_syn_${IT}" 2>&1 | tail -40
  else
    echo "missing snapshot $SNAP"
  fi
done

echo "=== demo on real frames (final ckpt) ==="
FINAL="$OUT/${PREFIX}_iter_30000.npz"
[ -f "$FINAL" ] || FINAL=$(ls -t "$OUT"/${PREFIX}_iter_*.npz | head -1)
python -m posecnn_tpu.cli.demo \
  --images /root/reference/data/demo_images \
  --ckpt "$FINAL" --refine --output output/demo 2>&1 | tail -20

echo "=== TPU kernel validation ==="
python experiments/validate_tpu.py 2>&1 | tail -5

echo "all done at $(date)"
