#!/bin/sh
# Clean-clean (high-quality, low-ISO) dataset pipeline: filter by EXIF ISO,
# then crop to training tiles (equivalent of the reference's
# make_clean-clean_dataset.sh + dl_and_crop_ds.sh composition).
#
# usage: make_clean_clean_dataset.sh <src_images_dir> <out_root> [max_iso] [crop]
set -e
SRC="${1:?src dir}"; OUT="${2:?out root}"; MAXISO="${3:-200}"; CROP="${4:-1024}"
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO_DIR:${PYTHONPATH}"
python -m nind_denoise_tpu.tools.filter_dataset_by_iso \
    --src_dir "$SRC" --dst_dir "$OUT/filtered" --max_iso "$MAXISO"
python -m nind_denoise_tpu.tools.crop_ds \
    --cs "$CROP" --stride "$CROP" --orig_data "$OUT/filtered" --resdir "$OUT/cropped" || true
echo "clean-clean dataset under $OUT"
