#!/bin/bash
# (ref pattern: experiments/scripts/*_train.sh — log tee + cfg dispatch)
set -e
mkdir -p experiments/logs
LOG="experiments/logs/lov_color_2d_adapt_train.$(date +'%Y-%m-%d_%H-%M-%S').log"
exec &> >(tee -a "$LOG")
python -m posecnn_tpu.cli.train_net --cfg experiments/cfgs/lov_color_2d_adapt.yaml "$@"
