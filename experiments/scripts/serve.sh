#!/bin/bash
# HTTP serving node (replaces ros/listener.py deployment)
set -e
python -m posecnn_tpu.cli.serve --cfg experiments/cfgs/lov_color_2d.yaml "$@"
