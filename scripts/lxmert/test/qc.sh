# Q-C caption-matching rejection gating a frozen answerer (reference scripts/lxmert/test/qc.sh)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/lxmert/qc/BEST}
LOAD_GQA=${LOAD_GQA:-$OUTPUT/lxmert/vanilla/BEST}
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone caps --data_root $DATA_ROOT \
    --test $subset --load $LOAD --scorer caption --load_gqa $LOAD_GQA \
    --ans_backbone lxmert --output $OUTPUT/lxmert/qc "$@"
done
