# Branched-confidence rejection (reference run/gqa_branched_test.bash)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/lxmert/branched/BEST}
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone lxmert --data_root $DATA_ROOT \
    --branched --test $subset --load $LOAD --scorer branched \
    --output $OUTPUT/lxmert/branched "$@"
done
