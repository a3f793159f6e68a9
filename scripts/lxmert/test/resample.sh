# MSP eval of the resampling-trained model (reference scripts/lxmert/test/resample.sh)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/lxmert/resampling/BEST}
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone lxmert --data_root $DATA_ROOT \
    --test $subset --load $LOAD --scorer msp --output $OUTPUT/lxmert/resample "$@"
done
