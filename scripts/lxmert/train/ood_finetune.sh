# Vanilla UQ-as-class finetune on the hard (unanswerable-only) UQ splits
# (reference run/gqa_ood_finetune.bash -> src/tasks/gqa_ood.py)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
python -m rgqa_tpu.cli.train --backbone lxmert --data_root $DATA_ROOT \
  --train GQAUQ_train_questions_unsup_hard,GQAUQ_valid_questions_unsup_hard \
  --uq_as_class --batchSize 32 --epochs 4 --lr 1e-5 \
  --output $OUTPUT/lxmert/ood_finetune "$@"
