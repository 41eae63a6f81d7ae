#!/bin/bash
# Synthetic pipeline-validation training
# (pattern ref: experiments/scripts/lov_color_2d_train.sh)
set -e
cd "$(dirname "$0")/../.."
LOG="experiments/logs/synthetic_small_train.$(date +'%Y-%m-%d_%H-%M-%S').log"
mkdir -p experiments/logs
exec &> >(tee -a "$LOG")

python -m posecnn_tpu.cli.train_net \
  --cfg experiments/cfgs/synthetic_small.yaml \
  --output output/synthetic_small \
  "$@"
