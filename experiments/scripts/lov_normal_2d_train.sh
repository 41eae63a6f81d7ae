#!/bin/bash
# (ref pattern: experiments/scripts/*_train.sh — log tee + cfg dispatch)
set -e
mkdir -p experiments/logs
LOG="experiments/logs/lov_normal_2d_train.$(date +'%Y-%m-%d_%H-%M-%S').log"
exec &> >(tee -a "$LOG")
python -m posecnn_tpu.cli.train_net --cfg experiments/cfgs/lov_normal_2d.yaml "$@"
