# VQA minival evaluation (reference run/vqa_test.bash --test minival)
DATA_ROOT=${DATA_ROOT:-data/vqa}
OUTPUT=${OUTPUT:-snap/vqa}
LOAD=${LOAD:-$OUTPUT/vanilla/BEST}
python -m rgqa_tpu.cli.vqa --backbone lxmert --data_root $DATA_ROOT \
  --test minival --load $LOAD --output $OUTPUT/vanilla "$@"
