# Q-C caption matcher training (run/gqa_caption -> caps backbone).
# BERT_PATH: local bert-base-uncased ckpt for the matcher's init
# (reference BertModel.from_pretrained, caps.py:17); skipped when unset.
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
BERT_FLAG=""
if [ -n "${BERT_PATH:-}" ]; then BERT_FLAG="--load_bert $BERT_PATH"; fi
python -m rgqa_tpu.cli.train --backbone caps --strategy caption \
  --data_root $DATA_ROOT $BERT_FLAG \
  --train GQAUQ_train_questions_unsup,GQAUQ_valid_questions_unsup \
  --batchSize 64 --epochs 10 --lr 1e-5 --output $OUTPUT/caps "$@"
