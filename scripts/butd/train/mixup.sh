# Mixup-RoI pseudo-UQ (reference scripts/butd/train/mixup.sh, beta=5)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
python -m rgqa_tpu.cli.train --backbone butd --data_root $DATA_ROOT \
  --train GQAUQ_train_questions_unsup,GQAUQ_valid_questions_unsup \
  --mixup_mode mixup_v1 --mixup_beta 5 --batchSize 32 --epochs 10 --lr 1e-5 \
  --save_all --output $OUTPUT/butd/mixup "$@"
