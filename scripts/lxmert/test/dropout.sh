# dropout rejection scoring (reference scripts/lxmert/test/dropout.sh)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/lxmert/vanilla/BEST}
EXTRA="--seed_list 0,1,2,3,4"
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone lxmert --data_root $DATA_ROOT \
    --test $subset --load $LOAD --scorer dropout $EXTRA \
    --output $OUTPUT/lxmert/dropout "$@"
done
