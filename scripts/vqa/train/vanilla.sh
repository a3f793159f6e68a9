# VQA v2 finetune (reference run/vqa_finetune.bash + src/tasks/vqa.py)
DATA_ROOT=${DATA_ROOT:-data/vqa}
OUTPUT=${OUTPUT:-snap/vqa}
python -m rgqa_tpu.cli.vqa --backbone lxmert --data_root $DATA_ROOT \
  --train train,nominival --valid minival \
  --batchSize 32 --epochs 4 --lr 5e-5 --output $OUTPUT/vanilla "$@"
