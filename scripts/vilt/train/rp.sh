# RP in-batch random-pairing pseudo-UQ on ViLT (strategy is backbone-agnostic)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
python -m rgqa_tpu.cli.train --backbone vilt --data_root $DATA_ROOT \
  --train GQAUQ_train_questions_unsup,GQAUQ_valid_questions_unsup \
  --sample_pair --batchSize 64 --epochs 10 --lr 1e-5 \
  --output $OUTPUT/vilt/rp "$@"
