#!/usr/bin/env bash
# Self-supervised variant launcher — counterpart of the reference's
# run_rag_self.sh (src_self): same canonical hyperparameters (cell:
# 100ep/bs8/lr.002; op: 100ep/bs6/lr.001/o_size10; photometric fine-tune:
# 300ep/bs3/lr.001/wd.003; supervised SceneFlow pretrain 9ep/bs8 per task).
#
# Pass --pretrain-list/--proxy-list for real SceneFlow(-Driving) lists;
# synthetic stand-ins are used otherwise. NOTE: the reference's "9 epochs"
# are epochs of SceneFlow (tens of thousands of steps); with a small
# synthetic stand-in set, 9 epochs is a few hundred steps and leaves the
# model outside the photometric basin — the fine-tune then collapses to
# the constant-disparity trivial minimum (measured round 5; see
# BASELINE.md). Scale PRETRAIN_EPOCHS to a comparable STEP count for
# stand-in data (e.g. PRETRAIN_EPOCHS=60 at --synthetic-size 256).
set -e
python -m rag_tpu.cli --variant selfsup --id 4-KRCD \
  --c_epochs "${C_EPOCHS:-100}" --c_batch 8 --c_lr 0.002 --c_lr_a 0.01 --c_lamb 0.0003 \
  --o_epochs "${O_EPOCHS:-100}" --o_batch 6 --o_lr 0.001 --o_lr_a 0.01 --o_lamb 0.0003 --o_size 10 \
  --epochs "${EPOCHS:-300}" --batch 3 --lr 0.001 --lamb 0.003 \
  --pretrain-epochs "${PRETRAIN_EPOCHS:-9}" --pretrain-batch 8 \
  --num-tasks 4 --synthetic "$@"
