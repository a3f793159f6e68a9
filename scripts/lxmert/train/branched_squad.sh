# Branched head on the SQuAD-sourced UQ splits
# (reference run/gqa_branched_squad.bash)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
python -m rgqa_tpu.cli.train --backbone lxmert --data_root $DATA_ROOT \
  --train GQAUQ_train_questions_squad,GQAUQ_valid_questions_squad \
  --branched --batchSize 32 --epochs 4 --lr 1e-5 \
  --output $OUTPUT/lxmert/branched_squad "$@"
