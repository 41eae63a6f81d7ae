#!/bin/bash
# LINEMOD end-to-end with the r5 recipe (VERDICT r4 task 7): eggbox
# (symmetric + the 180°-Z-flip eval class) trained with the rebuilt
# rotation recipe — hue-marker paint, replay pool, batch 8 half-scale,
# adam, qmag — then the 0.1·diameter / reproj / Z-flip eval.
#   setsid nohup bash experiments/linemod_r5.sh > experiments/logs/linemod_r5.log 2>&1 &
set -u
echo "start $(date)"
python -m posecnn_tpu.cli.train_net \
  --dataset linemod --data_root /root/reference/data/LINEMOD --cls eggbox \
  --cfg experiments/cfgs/linemod_ape_pose.yaml \
  --iters 10000 --output output/linemod_eggbox_r5 \
  --set train.stepsize=8000 train.snapshot_iters=2000 train.display=40 \
       train.num_units=32 train.scales_base="[0.5]" \
       train.ims_per_batch=8 train.optimizer=adam train.learning_rate=0.0003 \
       train.grad_clip=35.0 train.orient_paint=True train.gt_pose_rois=True \
       train.syn_pool_size=600 train.syn_pool_fresh=2 train.hough_backend=xla \
       train.max_host_rss_gb=100 \
       train.snapshot_prefix=posecnn_linemod_eggbox 2>&1 | tail -6
python -m posecnn_tpu.cli.test_net \
  --dataset linemod --data_root /root/reference/data/LINEMOD --cls eggbox \
  --cfg experiments/cfgs/linemod_ape_pose.yaml \
  --ckpt output/linemod_eggbox_r5/posecnn_linemod_eggbox_iter_10000.npz \
  --num_images 30 --seed 4242 --output output/linemod_eggbox_r5_eval \
  --set train.num_units=32 train.orient_paint=True \
       test.scales_base="[0.5]" train.hough_backend=xla 2>&1 | tail -14
echo "linemod r5 done $(date)"
