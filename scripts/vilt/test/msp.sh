# msp rejection over the 4 RGQA testdev subsets, ViLT backbone
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/vilt/vanilla/BEST}
EXTRA=""
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone vilt --data_root $DATA_ROOT \
    --test $subset --load $LOAD --scorer msp $EXTRA \
    --output $OUTPUT/vilt/msp "$@"
done
