#!/usr/bin/env bash
# GTSinger corpus fetch (reference local/download_gtsinger.sh role).
#
# The dataset is distributed per-language via Google Drive / HuggingFace
# (https://github.com/GTSinger/GTSinger). This build environment has zero
# egress, so this script only validates a pre-staged copy; on a connected
# machine, fetch with e.g.:
#   huggingface-cli download GTSinger/GTSinger --repo-type dataset \
#       --local-dir downloads/gtsinger
set -euo pipefail
db_root=${1:-downloads/gtsinger}
if [ -d "${db_root}" ] && find "${db_root}" -name "*.wav" | head -1 | grep -q .; then
    echo "GTSinger found at ${db_root}"
else
    echo "ERROR: stage GTSinger under ${db_root} (no network egress here)" >&2
    exit 1
fi
