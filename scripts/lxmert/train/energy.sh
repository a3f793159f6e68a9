# Energy-regularized training (reference run/gqa_energy_finetune.bash)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
python -m rgqa_tpu.cli.train --backbone lxmert --data_root $DATA_ROOT \
  --train GQAUQ_train_questions_unsup,GQAUQ_valid_questions_unsup \
  --scorer energy --m_in 25 --m_out 0 --batchSize 64 --epochs 10 --lr 1e-5 \
  --output $OUTPUT/lxmert/energy "$@"
