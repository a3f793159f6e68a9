# Branched confidence head on train-split pseudo-UQ only
# (reference run/gqa_branched_trainOnly_finetune.sh: GQAUQ train_unsup + valid)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
python -m rgqa_tpu.cli.train --backbone lxmert --data_root $DATA_ROOT \
  --train GQAUQ_train_questions_unsup,valid \
  --branched --batchSize 64 --epochs 10 --lr 1e-5 \
  --output $OUTPUT/lxmert/branched_trainonly "$@"
