#!/usr/bin/env bash
# Monocular-depth variant launcher — counterpart of the reference's
# rag_depth/run_rag_depth.sh: same canonical hyperparameters (cell:
# 100ep/bs16/lr.002; op: 100ep/bs12/lr.001/o_size10; fine-tune:
# 400ep/bs8/lr.001/wd.003).
set -e
python -m rag_tpu.cli --variant depth --id sup-depth \
  --c_epochs "${C_EPOCHS:-100}" --c_batch 16 --c_lr 0.002 --c_lr_a 0.01 --c_lamb 0.0003 \
  --o_epochs "${O_EPOCHS:-100}" --o_batch 12 --o_lr 0.001 --o_lr_a 0.01 --o_lamb 0.0003 --o_size 10 \
  --epochs "${EPOCHS:-400}" --batch 8 --lr 0.001 --lamb 0.003 \
  --num-tasks 4 --synthetic "$@"
