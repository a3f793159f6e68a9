# Mahalanobis rejection (train-set estimator + perturbation) (reference scripts/butd/test/maha.sh)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/butd/vanilla/BEST}
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone butd --data_root $DATA_ROOT \
    --test $subset --load $LOAD --scorer maha --train GQAUQ_train_questions_unsup --temperature 1e5 --noise 1e-4 --fast --output $OUTPUT/butd/maha "$@"
done
