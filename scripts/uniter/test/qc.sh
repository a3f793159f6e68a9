# Q-C caption-matching rejection gating a frozen answerer (reference scripts/uniter/test/qc.sh)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/uniter/qc/BEST}
LOAD_GQA=${LOAD_GQA:-$OUTPUT/uniter/vanilla/BEST}
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone caps --data_root $DATA_ROOT \
    --test $subset --load $LOAD --scorer caption --load_gqa $LOAD_GQA \
    --ans_backbone uniter --output $OUTPUT/uniter/qc "$@"
done
