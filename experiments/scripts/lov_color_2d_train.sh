#!/bin/bash
# YCB-Video color 2D training
# (ref: experiments/scripts/lov_color_2d_train.sh:16-24)
set -e
cd "$(dirname "$0")/../.."
LOG="experiments/logs/lov_color_2d_train.$(date +'%Y-%m-%d_%H-%M-%S').log"
mkdir -p experiments/logs
exec &> >(tee -a "$LOG")

python -m posecnn_tpu.cli.train_net \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --dataset ycb_video \
  --image_set train \
  --output output/lov_color_2d \
  "$@"
