#!/bin/bash
# Compile-cache prewarmer for the end-of-round eval suite: runs each
# finisher graph once NOW (numbers discarded — the chip is shared with
# the trainer) so the real eval runs hit /tmp/posecnn_jax_cache instead
# of paying 5-10 min of tunnel compile each inside the tight eval
# window. Serialized: one chip job at a time.
#   setsid nohup bash experiments/prewarm_evals.sh > experiments/logs/r6_prewarm3.log 2>&1 &
set -ux
cd /root/repo
export PATH=/opt/venv/bin:$PATH
CKPT=output/lov_syn_r6a/vgg16_fcn_color_single_frame_2d_pose_add_lov_iter_20000.npz

# wait for the prewarm2 batch (oracle/serve/validate chain) to drain
while [ -e /proc/16056 ]; do sleep 20; done

timeout 1800 python -m posecnn_tpu.cli.test_net \
  --dataset synthetic --data_root /root/reference/data/LOV \
  --cfg experiments/cfgs/lov_color_2d.yaml \
  --ckpt "$CKPT" --num_images 2 --seed 1 --refine --output /tmp/prewarm_icp
echo "icp prewarm rc=$?"

timeout 1200 python -m posecnn_tpu.cli.demo \
  --images /root/reference/data/demo_images --max_frames 1 --refine \
  --ckpt "$CKPT" --output /tmp/prewarm_demo2
echo "demo-refine prewarm rc=$?"

timeout 1800 python bench.py
echo "bench prewarm rc=$?"

timeout 2400 python experiments/bench_graph_phases.py
echo "graph-phases prewarm rc=$?"
