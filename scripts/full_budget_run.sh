#!/usr/bin/env bash
# Full-budget framework-validation run (VERDICT round-3 item 1): the real
# recipe + real CLIs on a synthetic-parallel GTSinger corpus, the reference's
# full 40k-step budget (conf/serenade.yaml:77 in /root/reference) at real
# sequence lengths, eval-sample checkpoints every 2500 steps, then an
# MCD / log-F0-RMSE trend over checkpoints via scripts/full_budget_eval.py.
#
# Usage: bash scripts/full_budget_run.sh [start_stage] [stop_stage]
#   stage 0-2  recipe data prep / feature extraction / statistics
#   stage 2.5  (always with <=2) GL vocoder stats + fixed ref styles
#   stage 3    40k-step training through bin/ssc_train (the recipe stage 3)
#   stage 4    final decode of dev+test through the recipe stage 4
#   stage 5    checkpoint-trend decode + objective evaluation
set -euo pipefail
cd "$(dirname "$0")/../egs/gtsinger/ssc1"
. ./path.sh  # PYTHONPATH to the repo root + persistent XLA compile cache

# FB_* env overrides let the same pipeline run as a tiny smoke
# (FB_TRAIN_SONGS=4 FB_TAG=fb_smoke ... with a short-step conf).
db=${FB_DB:-downloads/gtsinger_synth}
dumpdir=${FB_DUMPDIR:-dump_fb}
tag=${FB_TAG:-fullbudget}
conf=${FB_CONF:-conf/serenade_fullbudget.yaml}
ref_json=conf/refstyles_${tag}.json

start=${1:-0}
stop=${2:-100}

if [ "${start}" -le 0 ] && [ ! -d "${db}/EN" ]; then
    echo "== corpus generation =="
    JAX_PLATFORMS=cpu python ../../../scripts/make_synth_gtsinger.py \
        --out "${db}" --train-songs "${FB_TRAIN_SONGS:-180}"
fi

if [ "${start}" -le 2 ] && [ "${stop}" -ge 0 ]; then
    echo "== recipe stages 0-1 =="
    # FB_CONTENTVEC=<ckpt.pt>: run the REAL ContentVec extraction path
    # (scripts/make_synth_contentvec.py builds a seeded checkpoint on
    # zero-egress machines; see docs/CONTENTVEC_WEDGE.md).  Default: the
    # round-4 pseudo-content bypass (deterministic random projection),
    # the same between-stages pattern the recipe e2e test uses.
    cvec=${FB_CONTENTVEC:-/nonexistent}
    bash run.sh --stage "${start}" --stop_stage 1 \
        --db_root "${db}" --dumpdir "${dumpdir}" --conf "${conf}" \
        --tag "${tag}" --n_jobs 1 --skip_gtmidi true \
        --contentvec_ckpt "${cvec}"

    if [ ! -f "${cvec}" ]; then
        echo "== pseudo-content injection =="
        python ../../../scripts/inject_pseudo_content.py \
            --dumpdir "${dumpdir}/train" "${dumpdir}/dev" "${dumpdir}/test"
    fi

    echo "== recipe stage 2 =="
    bash run.sh --stage 2 --stop_stage 2 \
        --db_root "${db}" --dumpdir "${dumpdir}" --conf "${conf}" \
        --tag "${tag}" --n_jobs 1 --skip_gtmidi true

    echo "== GL vocoder stats + fixed reference styles =="
    python - "${dumpdir}" "${ref_json}" <<'PY'
import glob
import json
import sys

import numpy as np

from serenade_tpu.utils.h5 import write_hdf5

dumpdir, ref_json = sys.argv[1], sys.argv[2]
# identity stats: Griffin-Lim consumes raw log10-mel (the model-stats
# denorm in the Vocoder facade already recovers it)
write_hdf5(f"{dumpdir}/voc_stats.h5", "mean", np.zeros(80, np.float32))
write_hdf5(f"{dumpdir}/voc_stats.h5", "scale", np.ones(80, np.float32))
# conf/serenade_fullbudget*.yaml hardcode vocoder.stats as
# dump_fb/voc_stats.h5; when this run uses another FB_DUMPDIR the
# trainer/decoder would read a missing file (np.asarray(None) -> NaN
# stats -> NaN eval/decode audio).  Keep the hardcoded path valid too.
if dumpdir != "dump_fb":
    write_hdf5("dump_fb/voc_stats.h5", "mean", np.zeros(80, np.float32))
    write_hdf5("dump_fb/voc_stats.h5", "scale", np.ones(80, np.float32))

refs = {}
for style in ("Breathy", "Falsetto", "Pharyngeal", "Mixed_Voice"):
    cands = sorted(glob.glob(f"{dumpdir}/train/*_{style}_Group_*.h5"))
    assert cands, f"no train dump for style {style}"
    refs[style] = cands[0]
with open(ref_json, "w") as f:
    json.dump(refs, f, indent=2)
print("reference styles:", json.dumps(refs, indent=2))
PY
fi

if [ "${start}" -le 3 ] && [ "${stop}" -ge 3 ]; then
    echo "== recipe stage 3: 40k-step training =="
    bash run.sh --stage 3 --stop_stage 3 \
        --db_root "${db}" --dumpdir "${dumpdir}" --conf "${conf}" \
        --tag "${tag}" --skip_gtmidi true
fi

if [ "${start}" -le 4 ] && [ "${stop}" -ge 4 ]; then
    echo "== recipe stage 4: decode dev/test at the final checkpoint =="
    bash run.sh --stage 4 --stop_stage 4 \
        --db_root "${db}" --dumpdir "${dumpdir}" --conf "${conf}" \
        --tag "${tag}" --n_jobs 1 --ref_dict "${ref_json}" \
        --decode_batch_size 8 --skip_gtmidi true
fi

if [ "${start}" -le 5 ] && [ "${stop}" -ge 5 ]; then
    echo "== checkpoint-trend objective evaluation =="
    python ../../../scripts/full_budget_eval.py \
        --expdir "exp/${tag}" --dumpdir "${dumpdir}" --db-root "${db}" \
        --ref-dict "${ref_json}" --outdir "exp/${tag}/trend"
fi
