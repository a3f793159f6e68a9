# ODIN: temperature-scaled, input-perturbed rejection (reference scripts/uniter/test/odin.sh)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/uniter/vanilla/BEST}
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone uniter --data_root $DATA_ROOT \
    --test $subset --load $LOAD --scorer odin --temperature 1e5 --noise 1e-4 --output $OUTPUT/uniter/odin "$@"
done
