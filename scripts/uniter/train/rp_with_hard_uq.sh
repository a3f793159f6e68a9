# RP + hard-UQ splits (reference scripts/uniter/train/rp_with_hard_uq.sh)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
python -m rgqa_tpu.cli.train --backbone uniter --data_root $DATA_ROOT \
  --train GQAUQ_train_questions_unsup_hard,GQAUQ_valid_questions_unsup_hard \
  --save_all --batchSize 64 --epochs 10 --lr 1e-5 \
  --output $OUTPUT/uniter/rp_hard_uq "$@"
