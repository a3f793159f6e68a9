# Q-C caption-matching rejection gating a frozen answerer (reference scripts/butd/test/qc.sh)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/butd/qc/BEST}
LOAD_GQA=${LOAD_GQA:-$OUTPUT/butd/vanilla/BEST}
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone caps --data_root $DATA_ROOT \
    --test $subset --load $LOAD --scorer caption --load_gqa $LOAD_GQA \
    --ans_backbone butd --output $OUTPUT/butd/qc "$@"
done
