#!/bin/bash
# LINEMOD end-to-end proof (VERDICT r2 task 6): wait for the round-3
# post-training pipeline to finish with the chip, then train one
# single-object LINEMOD config (eggbox: symmetric + the 180°-Z-flip
# eval class) on synthetic scenes at the real LINEMOD extents and
# evaluate with 0.1·diameter / reproj<5px / Z-flip retry.
#   setsid nohup bash experiments/linemod_r3.sh > experiments/logs/linemod_r3.log 2>&1 &
set -u
while ! grep -q "all done" experiments/logs/after_train_r3.log 2>/dev/null; do
  sleep 60
done
echo "chip free at $(date); starting LINEMOD eggbox run"
python -m posecnn_tpu.cli.train_net \
  --dataset linemod --data_root /root/reference/data/LINEMOD --cls eggbox \
  --cfg experiments/cfgs/linemod_ape_pose.yaml \
  --iters 8000 --output output/linemod_eggbox_r3 \
  --set train.stepsize=6000 train.snapshot_iters=4000 train.display=40 \
       train.syn_width=320 train.syn_height=240 train.num_units=32 \
       train.snapshot_prefix=posecnn_linemod_eggbox 2>&1 | tail -4
python -m posecnn_tpu.cli.test_net \
  --dataset linemod --data_root /root/reference/data/LINEMOD --cls eggbox \
  --cfg experiments/cfgs/linemod_ape_pose.yaml \
  --ckpt output/linemod_eggbox_r3/posecnn_linemod_eggbox_iter_8000.npz \
  --num_images 30 --seed 4242 --output output/linemod_eggbox_r3_eval \
  --set train.syn_width=320 train.syn_height=240 train.num_units=32 2>&1 | tail -12
echo "linemod done at $(date)"
