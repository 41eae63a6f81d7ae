#!/bin/bash
# video recurrent test loop (ref: lov_color test video path test.py:381-555)
set -e
python -m posecnn_tpu.cli.test_video --cfg experiments/cfgs/lov_color_rnn.yaml "$@"
