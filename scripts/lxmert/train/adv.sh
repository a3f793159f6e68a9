# VILLA adversarial training (reference run/gqa_adv_finetune.bash)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
python -m rgqa_tpu.cli.train --backbone lxmert --data_root $DATA_ROOT \
  --train GQAUQ_train_questions_unsup,GQAUQ_valid_questions_unsup \
  --strategy adv --adv_steps 3 --adv_lr_txt 1e-3 --adv_lr_img 1e-3 \
  --adv_kl_weight 1.5 --batchSize 32 --epochs 10 --lr 1e-5 \
  --output $OUTPUT/lxmert/adv "$@"
