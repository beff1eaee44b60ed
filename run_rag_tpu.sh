#!/usr/bin/env bash
# Canonical launcher — the counterpart of the reference's run_rag.sh with
# the same hyperparameters (cell: 100ep/bs8/lr.002/lr_a.01; op: 100ep/bs6/
# lr.001/lr_a.01/o_size10; train: 400ep/bs4/lr.001/wd.003).
#
# With no real DrivingStereo data mounted it runs on synthetic stereograms;
# pass --train-lists/--test-lists to use filename lists.
set -e
python -m rag_tpu.cli \
  --c_epochs "${C_EPOCHS:-100}" --c_batch 8 --c_lr 0.002 --c_lr_a 0.01 \
  --o_epochs "${O_EPOCHS:-100}" --o_batch 6 --o_lr 0.001 --o_lr_a 0.01 --o_size 10 \
  --epochs "${EPOCHS:-400}" --batch 4 --lr 0.001 --lamb 0.003 \
  --num-tasks 4 --synthetic --train-router "$@"
