# ODIN: temperature-scaled, input-perturbed rejection (reference scripts/butd/test/odin.sh)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/butd/vanilla/BEST}
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone butd --data_root $DATA_ROOT \
    --test $subset --load $LOAD --scorer odin --temperature 1e5 --noise 1e-4 --output $OUTPUT/butd/odin "$@"
done
