#!/bin/bash
# YCB-Video color 2D evaluation
# (ref: experiments/scripts/lov_color_2d_test.sh)
set -e
cd "$(dirname "$0")/../.."
LOG="experiments/logs/lov_color_2d_test.$(date +'%Y-%m-%d_%H-%M-%S').log"
mkdir -p experiments/logs
exec &> >(tee -a "$LOG")

python -m posecnn_tpu.cli.test_net \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --dataset ycb_video \
  --image_set keyframe \
  --output output/lov_color_2d_eval \
  "$@"
