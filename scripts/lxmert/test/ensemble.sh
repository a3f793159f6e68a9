# Ensemble rejection over comma-listed checkpoints (reference run/gqa_ensemble_test.bash)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOADS=${LOADS:-$OUTPUT/lxmert/vanilla/BEST,$OUTPUT/lxmert/rp/BEST}
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone lxmert --data_root $DATA_ROOT \
    --test $subset --load $LOADS --ensemble_method mean \
    --output $OUTPUT/lxmert/ensemble "$@"
done
