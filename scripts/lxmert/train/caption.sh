# Q-C caption matcher training (run/gqa_caption -> caps backbone)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
python -m rgqa_tpu.cli.train --backbone caps --strategy caption \
  --data_root $DATA_ROOT \
  --train GQAUQ_train_questions_unsup,GQAUQ_valid_questions_unsup \
  --batchSize 64 --epochs 10 --lr 1e-5 --output $OUTPUT/caps "$@"
