# Run every ViLT rejection evaluation. The grad-at-eval scorers
# (odin/maha) perturb RoI feats/boxes, which the pixel-based ViLT has
# none of, so the ViLT matrix is the single-pass + MC-dropout scorers.
HERE="$(dirname "$0")"
sh "$HERE"/msp.sh "$@"
sh "$HERE"/energy.sh "$@"
sh "$HERE"/dropout.sh "$@"
