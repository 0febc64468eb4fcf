#!/usr/bin/env bash
# Fetch the six audio-visual datasets (frames, audio, annotations, fold lists)
# and pretrained torch checkpoints from the STAViS server — capability parity
# with the reference's fetch_data.sh (/root/reference/fetch_data.sh:1-51),
# with a configurable DATA_ROOT instead of a hardcoded cluster path.
#
# Usage: DATA_ROOT=/path/to/data bash scripts/fetch_data.sh [subset ...]
#   subset: any of AVAD Coutrot_db1 Coutrot_db2 DIEM ETMD_av SumMe
set -euo pipefail

fetch_site='http://cvsp.cs.ntua.gr/research/stavis/data'
data_root="${DATA_ROOT:-./data}"

if [ "$#" -gt 0 ]; then
  db_names=("$@")
else
  db_names=(AVAD Coutrot_db1 Coutrot_db2 DIEM ETMD_av SumMe)
fi

fetch_tar() { # url dest_dir
  local url=$1 dest=$2 tmp
  tmp="$dest/$(basename "$url")"
  mkdir -p "$dest"
  wget -q --show-progress "$url" -O "$tmp"
  tar -xzf "$tmp" -C "$dest"
  rm -f "$tmp"
}

for part in video_frames video_audio annotations; do
  echo "### $part ###"
  for db in "${db_names[@]}"; do
    echo "  $db ..."
    fetch_tar "$fetch_site/$part/$db.tar.gz" "$data_root/$part"
  done
done

echo '### fold lists ###'
fetch_tar "$fetch_site/fold_lists.tar.gz" "$data_root"

echo '### pretrained torch checkpoints (convert with vinet_tpu.io.convert) ###'
fetch_tar "$fetch_site/pretrained_models.tar.gz" "$data_root"
