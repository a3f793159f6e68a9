# Online distillation from a frozen teacher (run/gqa_distill_online.bash)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
TEACHER=${TEACHER:-$OUTPUT/lxmert/vanilla/BEST}
python -m rgqa_tpu.cli.train --backbone lxmert --data_root $DATA_ROOT \
  --strategy distill_online --teacher_path $TEACHER --mixup_mode mixup_v1 \
  --lam 0.5 --batchSize 32 --epochs 10 --lr 1e-5 \
  --output $OUTPUT/lxmert/distill_online "$@"
