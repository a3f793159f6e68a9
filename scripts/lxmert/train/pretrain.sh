# LXMERT pretraining (run/lxmert_pretrain.bash)
DATA_ROOT=${DATA_ROOT:-data/lxmert}
OUTPUT=${OUTPUT:-snap/pretrain}
python -m rgqa_tpu.cli.pretrain --data_root $DATA_ROOT \
  --taskMaskLM --taskMatched --taskObjPredict --taskQA \
  --visualLosses obj,attr,feat --batchSize 256 --epochs 12 --lr 1e-4 \
  --output $OUTPUT "$@"
