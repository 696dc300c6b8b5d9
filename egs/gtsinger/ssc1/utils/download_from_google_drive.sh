#!/usr/bin/env bash
# Download a (possibly large) file from Google Drive and optionally unpack
# it (reference utils/download_from_google_drive.sh role).
#
# Usage: download_from_google_drive.sh <share-url> [outdir] [ext]
#   share-url  e.g. "https://drive.google.com/open?id=<FILEID>"
#   outdir     target directory (default .)
#   ext        archive type to unpack: tar.gz | zip | none (default tar.gz)
set -euo pipefail

[ $# -ge 1 ] || { echo "usage: $0 <share-url> [outdir] [tar.gz|zip|none]" >&2; exit 2; }
url="$1"
outdir="${2:-.}"
ext="${3:-tar.gz}"
mkdir -p "${outdir}"

fileid="$(echo "${url}" | sed -E 's/.*[?&]id=([^&]+).*/\1/;t;s|.*/d/([^/]+).*|\1|')"
[ -n "${fileid}" ] || { echo "could not parse a file id from '${url}'" >&2; exit 2; }

out="${outdir}/${fileid}"
[ "${ext}" != "none" ] && out="${out}.${ext}"

if command -v gdown >/dev/null 2>&1; then
    gdown "https://drive.google.com/uc?id=${fileid}" -O "${out}"
else
    # cookie dance for the large-file confirmation page
    cookies="$(mktemp)"
    trap 'rm -f "${cookies}"' EXIT
    confirm="$(curl -sc "${cookies}" \
        "https://drive.google.com/uc?export=download&id=${fileid}" \
        | sed -En 's/.*confirm=([0-9A-Za-z_-]+).*/\1/p' | head -1)"
    curl -Lb "${cookies}" \
        "https://drive.google.com/uc?export=download${confirm:+&confirm=${confirm}}&id=${fileid}" \
        -o "${out}"
fi

case "${ext}" in
    tar.gz) tar -xzf "${out}" -C "${outdir}" ;;
    zip) unzip -o "${out}" -d "${outdir}" ;;
    none) ;;
    *) echo "unknown ext '${ext}' (tar.gz|zip|none)" >&2; exit 2 ;;
esac
echo "downloaded ${fileid} -> ${outdir}"
