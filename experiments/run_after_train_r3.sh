#!/bin/bash
# Round-3 post-training pipeline: wait for the lov_syn_r3 chunked run
# to reach its target, then
#   1. evaluate the snapshot curve on held-out synthetic scenes
#      (textured + composited, same distribution as training),
#   2. ICP re-validation: final-checkpoint eval WITH --refine on the
#      rendered depth (VERDICT r2 task 5) for the ADD(-S) delta,
#   3. real-frame demo with ICP refinement,
#   4. per-round TPU kernel validation (now incl. rotation probes),
#   5. train-step + serving benches.
# Run detached:
#   setsid nohup bash experiments/run_after_train_r3.sh > experiments/logs/after_train_r3.log 2>&1 &
set -u
OUT=${1:-output/lov_syn_r3}
TARGET=${2:-40000}
PREFIX=vgg16_fcn_color_single_frame_2d_pose_add_lov

echo "waiting for $OUT to reach iter $TARGET ..."
while true; do
  newest=$(ls "$OUT"/${PREFIX}_iter_*.npz 2>/dev/null \
    | sed -E 's/.*_iter_([0-9]+)\.npz/\1/' | sort -n | tail -1)
  newest=${newest:-0}
  [ "$newest" -ge "$TARGET" ] && break
  # also stop waiting if the chunked driver gave up
  if grep -q "FAILED: target iter" experiments/logs/train_chunked_r3.log 2>/dev/null; then
    echo "chunked driver failed; evaluating newest snapshot $newest"
    break
  fi
  sleep 60
done
echo "training done at $(date), newest=$newest"

for IT in 8000 16000 24000 32000 40000; do
  SNAP="$OUT/${PREFIX}_iter_${IT}.npz"
  if [ -f "$SNAP" ]; then
    echo "=== eval @ $IT ==="
    python -m posecnn_tpu.cli.test_net \
      --dataset synthetic --data_root /root/reference/data/LOV \
      --cfg experiments/cfgs/lov_color_2d.yaml \
      --ckpt "$SNAP" --num_images 30 --seed 4242 \
      --output "output/r3_eval_syn_${IT}" 2>&1 | tail -8
  else
    echo "missing snapshot $SNAP"
  fi
done

FINAL=$(ls -t "$OUT"/${PREFIX}_iter_*.npz | head -1)
echo "=== ICP re-validation: eval final ckpt WITH --refine ==="
python -m posecnn_tpu.cli.test_net \
  --dataset synthetic --data_root /root/reference/data/LOV \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --ckpt "$FINAL" --num_images 30 --seed 4242 --refine \
  --output output/r3_eval_syn_final_icp 2>&1 | tail -8

echo "=== demo on real frames (final ckpt, ICP) ==="
python -m posecnn_tpu.cli.demo \
  --images /root/reference/data/demo_images \
  --ckpt "$FINAL" --refine --output output/r3_demo 2>&1 | tail -10

echo "=== TPU kernel validation (with rotation probes) ==="
python experiments/validate_tpu.py 2>&1 | tail -3

echo "=== train-step bench (MXU roi-align) ==="
python experiments/bench_train_components.py 2>&1 | tail -12

echo "all done at $(date)"
