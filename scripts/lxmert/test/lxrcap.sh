# LXMERT-match rejection via the pretraining matched head (run/gqa_lxrcap_test.bash)
DATA_ROOT=${DATA_ROOT:-data/gqa}
OUTPUT=${OUTPUT:-snap/gqa}
LOAD=${LOAD:-$OUTPUT/lxmert/vanilla/BEST}
PRETRAIN=${PRETRAIN:-snap/pretrained/model_orbax}
for subset in GQAUQ_testdev_questions_ClipEasy GQAUQ_testdev_questions_ClipHard GQAUQ_testdev_questions_PTEasy GQAUQ_testdev_questions_PTHard; do
  python -m rgqa_tpu.cli.evaluate --backbone lxmert --data_root $DATA_ROOT \
    --test $subset --load $LOAD --scorer match --loadLXMERT $PRETRAIN \
    --output $OUTPUT/lxmert/lxrcap "$@"
done
