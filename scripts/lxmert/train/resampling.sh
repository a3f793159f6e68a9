# resampling dual-loader training (reference run/gqa_resampling_finetune.bash)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
python -m rgqa_tpu.cli.train --backbone lxmert --data_root $DATA_ROOT \
  --strategy resampling --train_pos GQAUQ_train_questions_unsup \
  --train_neg GQAUQ_train_questions_unsup_hard \
  --batchSize 32 --epochs 10 --lr 1e-5 --lr_w 0.1 \
  --output $OUTPUT/lxmert/resampling "$@"
