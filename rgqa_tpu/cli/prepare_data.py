"""Data preparation: reference download layout -> packed TPU layout.

The reference fetches GQA/RGQA JSONs + bottom-up-attention TSVs
(``data/download_rgqa.sh``) and re-decodes the TSVs on every run; this
converter runs ONCE:

    python -m rgqa_tpu.cli.prepare_data \
        --tsv data/vg_gqa_imgfeat/vg_gqa_obj36.tsv \
        --json_dir data/gqa --vocab path/to/bert_vocab.txt \
        --out data_packed

Produces the ``rgqa_tpu`` data root: split JSONs (copied), answer vocab
(copied), ``features/`` (packed memory-mappable arrays via the native C++
decoder), and ``vocab.txt``.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil


def main(argv=None):
    p = argparse.ArgumentParser(allow_abbrev=False)
    p.add_argument("--tsv", required=True, help="bottom-up-attention TSV")
    p.add_argument("--json_dir", required=True, help="dir with split JSONs + ans2label")
    p.add_argument(
        "--vocab", required=True,
        help="WordPiece vocab.txt (bert-base-uncased for LXMERT; the "
        "reference's UNITER path uses the bert-base-CASED vocab while "
        "still lowercasing input — uniter/entry.py:69-70 — so pass the "
        "cased vocab for UNITER parity)",
    )
    p.add_argument("--out", required=True)
    p.add_argument("--topk", type=int, default=None, help="limit images (--tiny/--fast)")
    p.add_argument("--num_boxes", type=int, default=36)
    p.add_argument(
        "--int8", action="store_true",
        help="store features as per-RoI int8 + f32 scales (4x smaller at "
        "rest, dequantized on access; ~0.4%% per-element quantization "
        "error — for serving/eval deployments, see --feed_int8 for the "
        "transport-only variant)",
    )
    p.add_argument(
        "--pack_pixels", metavar="IMG_ROOT",
        help="also pre-decode the raw JPEGs under IMG_ROOT into a uint8 "
        "PixelPack — <out>/pixels_<size>_<mode> (pixelbert/ViLT) or "
        "<out>/pixels_clip_<size> (clip) — so serving reads memmap rows "
        "instead of paying per-image JPEG decode",
    )
    p.add_argument("--pixel_size", type=int, default=None,
                   help="default 384 (pixelbert) / 224 (clip)")
    p.add_argument(
        "--pixel_mode", choices=("pad", "crop"), default=None,
        help="pixelbert only (default pad); clip has one geometry",
    )
    p.add_argument(
        "--pixel_transform", choices=("pixelbert", "clip"),
        default="pixelbert",
        help="pixelbert = ViLT rows (pad/crop + rect); clip = CLIP "
        "shortest-edge + center-crop rows for the jitted CLIP scorer",
    )
    args = p.parse_args(argv)

    from rgqa_tpu.data.tsv import pack_obj_tsv

    os.makedirs(args.out, exist_ok=True)
    for path in glob.glob(os.path.join(args.json_dir, "*.json")):
        shutil.copy(path, args.out)
    shutil.copy(args.vocab, os.path.join(args.out, "vocab.txt"))
    packed = pack_obj_tsv(
        args.tsv,
        os.path.join(args.out, "features"),
        topk=args.topk,
        num_boxes=args.num_boxes,
        int8=args.int8,
    )
    kind = "int8-quantized" if args.int8 else "f32"
    print(f"packed {len(packed)} images ({kind}) into {args.out}/features")

    if args.pack_pixels:
        from rgqa_tpu.data.images import pack_pixels

        size = args.pixel_size or (
            224 if args.pixel_transform == "clip" else 384
        )
        if args.pixel_transform == "clip":
            if args.pixel_mode is not None:
                raise SystemExit(
                    "--pixel_mode applies to --pixel_transform pixelbert "
                    "only (clip always resizes shortest-edge + center "
                    "crops)"
                )
            pdir = os.path.join(args.out, f"pixels_clip_{size}")
            mode = None
        else:
            mode = args.pixel_mode or "pad"
            pdir = os.path.join(args.out, f"pixels_{size}_{mode}")
        pack = pack_pixels(
            args.pack_pixels, pdir,
            size=size, mode=mode,
            transform=args.pixel_transform,
        )
        print(f"packed {len(pack.img_ids)} images (uint8 pixels) into {pdir}")


if __name__ == "__main__":
    main()
