#!/bin/bash
# Demo inference on the 5-frame fixture (ref: experiments/scripts/demo.sh)
set -e
cd "$(dirname "$0")/../.."
python -m posecnn_tpu.cli.demo --output output/demo "$@"
