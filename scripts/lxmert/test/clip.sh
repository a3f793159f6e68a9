# CLIP image-question similarity rejection (reference run/gqa_clip_test.bash
# + src/tasks/gqa_clip.py; needs a local CLIP checkpoint, zero-egress)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/lxmert/vanilla/BEST}
CLIP_PATH=${CLIP_PATH:-openai/clip-vit-base-patch32}
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone lxmert --data_root $DATA_ROOT \
    --test $subset --load $LOAD --scorer clip --clip_path $CLIP_PATH \
    --output $OUTPUT/lxmert/clip "$@"
done
