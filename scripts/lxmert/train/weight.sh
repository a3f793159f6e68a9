# CLIP-weighted RP (reference run/gqa_weight_finetune.bash + src/tasks/
# gqa_weight.py): negative-pair losses weighted by CLIP image-question
# similarity.  Set CLIP_PATH to a local CLIP checkpoint dir; add
# --update_weight_model to adversarially train the weight model
# (gqa_weight.py:228-238).
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
CLIP_PATH=${CLIP_PATH:-data/clip-vit-base-patch32}
python -m rgqa_tpu.cli.train --backbone lxmert --data_root $DATA_ROOT \
  --train GQAUQ_train_questions_unsup,GQAUQ_valid_questions_unsup \
  --strategy weight --clip_path $CLIP_PATH \
  --batchSize 32 --epochs 4 --lr 1e-5 \
  --output $OUTPUT/lxmert/weight "$@"
