#!/usr/bin/env bash
# GTSinger singing style conversion recipe (TPU build).
#
# Same 9-stage pipeline as the reference recipe
# (/root/reference/egs/gtsinger/ssc1/run.sh:46-315); stages communicate only
# through the filesystem (h5 dumps, stats.joblib, orbax checkpoints, wavs).
#
#   0  data preparation (wav.scp + splits)
#   1  feature extraction (sharded over n_jobs)
#   2  scaler statistics
#   3  training
#   4  decode dev/test
#   5  decode the TRAIN set (inputs for cyclic fine-tuning)
#   6  re-extract features of converted audio + inject cyclic_logmel
#   7  cyclic fine-tuning from the stage-3 checkpoint
#   8  decode with the cyclic model
#   9  SiFiGAN post-processing
#  10  objective evaluation (MCD / log-F0 RMSE / V/UV vs source wavs —
#      content/melody preservation; the upstream recipe has no
#      evaluation tooling at all)

set -euo pipefail

stage=0
stop_stage=100
n_jobs=2                 # feature-extraction shards
conf=conf/serenade.yaml
cyclic_conf=conf/serenade_cyclic.yaml
f0_path=conf/f0.yaml
ref_dict=conf/refstyles.json
db_root=downloads/gtsinger
expdir=exp/serenade
tag=""               # experiment tag: expdir becomes exp/<tag>
skip_extract_train=false   # stage 1: skip the train split (inference-only runs)
dumpdir=dump
contentvec_ckpt=pt_models/contentvec.pt
midi_model_ckpt=pt_models/midi_model.pt
pretrain=""
resume=""
checkpoint=""
model_axis=1
decode_data_axis=1   # mesh-dp per decode process (pod slices)
decode_batch_size=8  # bucket-batched conversions per dispatch
variant=""            # "" or "new" (SerenadeNew / -modded CLIs)
skip_gtmidi=false     # true => no GT score MIDI (datasets without JSON scores)
sifigan_ckpt=pt_models/sifigan/checkpoint.pkl  # torch .pkl or orbax dir
sifigan_stats=pt_models/sifigan/stats.joblib   # released-model scaler
sifigan_conf=""       # stage-9 yaml (sample_rate/generator dims overrides)
eval_target_dir=""    # stage 10: wavs to pair converted outputs against
                      # (content-preservation metrics; default db_root)

. ./path.sh
. ./utils/parse_options.sh
. ./cmd.sh

suffix=""
[ -n "${variant}" ] && suffix="_${variant}"
[ -n "${tag}" ] && expdir="exp/${tag}"

train_set=train
dev_set=dev
eval_set=test

if [ "${stage}" -le 0 ] && [ "${stop_stage}" -ge 0 ]; then
    echo "stage 0: data preparation"
    mkdir -p data
    python local/create_wav_scp.py --db-root "${db_root}" --out data/all_wav.scp
    python local/create_gtsinger_splits.py --scp data/all_wav.scp --outdir data
fi

if [ "${stage}" -le 1 ] && [ "${stop_stage}" -ge 1 ]; then
    echo "stage 1: feature extraction (${n_jobs} shards)"
    for split in ${train_set} ${dev_set} ${eval_set}; do
        if [ "${split}" = "${train_set}" ] && [ "${skip_extract_train}" = "true" ]; then
            echo "skipping feature extraction for ${split}"
            continue
        fi
        mkdir -p "${dumpdir}/${split}"
        python utils/split_scp.py "data/${split}/wav.scp" "${n_jobs}"
        extra=()
        [ -f "${contentvec_ckpt}" ] && extra+=(--contentvec-ckpt "${contentvec_ckpt}")
        [ -f "${contentvec_ckpt}" ] || extra+=(--allow-missing-hubert true)
        [ -f "${midi_model_ckpt}" ] && extra+=(--midi-model-ckpt "${midi_model_ckpt}")
        ${train_cmd:-utils/launch.sh} --array "1:${n_jobs}" \
            "${dumpdir}/${split}/preprocessing.JOB.log" \
            python -m serenade_tpu.bin.preprocess${suffix} \
                --wav-scp "data/${split}/wav.JOB.scp" \
                --dumpdir "${dumpdir}/${split}" \
                --midi-path "data/midi.csv" \
                --f0-path "${f0_path}" \
                --skip-gtmidi "${skip_gtmidi}" \
                --config "${conf}" \
                "${extra[@]}" \
            || { echo "feature extraction failed for ${split}"; exit 1; }
    done
fi

if [ "${stage}" -le 2 ] && [ "${stop_stage}" -ge 2 ]; then
    echo "stage 2: scaler statistics"
    python -m serenade_tpu.bin.compute_statistics \
        --rootdir "${dumpdir}/${train_set}" \
        --dumpdir "${dumpdir}" \
        --config "${conf}"
fi

if [ "${stage}" -le 3 ] && [ "${stop_stage}" -ge 3 ]; then
    echo "stage 3: training"
    mkdir -p "${expdir}"
    python -m serenade_tpu.bin.ssc_train${suffix} \
        --train-dumpdir "${dumpdir}/${train_set}" \
        --dev-dumpdir "${dumpdir}/${dev_set}" \
        --stats "${dumpdir}/stats.joblib" \
        --outdir "${expdir}" \
        --config "${conf}" \
        --model-axis "${model_axis}" \
        ${pretrain:+--init-checkpoint "${pretrain}"} \
        ${resume:+--resume "${resume}"} \
        | tee "${expdir}/train.log"
fi

latest_ckpt () {
    python - "$1" <<'PY'
import sys
from serenade_tpu.checkpoint import find_latest_checkpoint
print(find_latest_checkpoint(sys.argv[1]) or "")
PY
}

if [ "${stage}" -le 4 ] && [ "${stop_stage}" -ge 4 ]; then
    echo "stage 4: decode dev/test (${n_jobs} shards)"
    ckpt="${checkpoint:-$(latest_ckpt ${expdir})}"
    for split in ${dev_set} ${eval_set}; do
        mkdir -p "${expdir}/decoded/${split}"
        ${decode_cmd:-utils/launch.sh} --array "1:${n_jobs}" \
            "${expdir}/decoded/decode.${split}.JOB.log" \
            python -m serenade_tpu.bin.ssc_decode${suffix} \
                --dumpdir "${dumpdir}/${split}" \
                --stats "${dumpdir}/stats.joblib" \
                --ref-dict "${ref_dict}" \
                --outdir "${expdir}/decoded/${split}" \
                --checkpoint "${ckpt}" \
                --batch-size "${decode_batch_size}" \
                --data-axis "${decode_data_axis}" \
                --num-shards "${n_jobs}" --shard JOB \
            || { cat "${expdir}/decoded/decode.${split}."*.log; exit 1; }
    done
fi

if [ "${stage}" -le 5 ] && [ "${stop_stage}" -ge 5 ]; then
    echo "stage 5: decode the train set (cyclic data, ${n_jobs} shards)"
    ckpt="${checkpoint:-$(latest_ckpt ${expdir})}"
    mkdir -p "${expdir}/decoded/${train_set}"
    ${decode_cmd:-utils/launch.sh} --array "1:${n_jobs}" \
        "${expdir}/decoded/decode.${train_set}.JOB.log" \
        python -m serenade_tpu.bin.ssc_decode${suffix} \
            --dumpdir "${dumpdir}/${train_set}" \
            --stats "${dumpdir}/stats.joblib" \
            --outdir "${expdir}/decoded/${train_set}" \
            --checkpoint "${ckpt}" \
            --batch-size "${decode_batch_size}" \
            --data-axis "${decode_data_axis}" \
            --num-shards "${n_jobs}" --shard JOB \
        || { cat "${expdir}/decoded/decode.${train_set}."*.log; exit 1; }
fi

if [ "${stage}" -le 6 ] && [ "${stop_stage}" -ge 6 ]; then
    echo "stage 6: features of converted audio + cyclic_logmel injection"
    mkdir -p "${dumpdir}/${train_set}_cyclic" data/${train_set}_cyclic
    python local/create_wav_scp.py \
        --db-root "${expdir}/decoded/${train_set}" \
        --out "data/${train_set}_cyclic/wav.scp" --flat
    extra=()
    [ -f "${contentvec_ckpt}" ] && extra+=(--contentvec-ckpt "${contentvec_ckpt}")
    [ -f "${contentvec_ckpt}" ] || extra+=(--allow-missing-hubert true)
    python -m serenade_tpu.bin.preprocess${suffix} \
        --wav-scp "data/${train_set}_cyclic/wav.scp" \
        --dumpdir "${dumpdir}/${train_set}_cyclic" \
        --f0-path "${f0_path}" \
        --skip-gtmidi true \
        --config "${conf}" \
        "${extra[@]}"
    python local/create_cyclic_dump.py \
        --src-dumpdir "${dumpdir}/${train_set}" \
        --cyclic-dumpdir "${dumpdir}/${train_set}_cyclic"
fi

if [ "${stage}" -le 7 ] && [ "${stop_stage}" -ge 7 ]; then
    echo "stage 7: cyclic fine-tuning"
    mkdir -p "${expdir}_cyclic"
    ckpt="${checkpoint:-$(latest_ckpt ${expdir})}"
    python -m serenade_tpu.bin.ssc_train${suffix} \
        --train-dumpdir "${dumpdir}/${train_set}_cyclic" \
        --dev-dumpdir "${dumpdir}/${dev_set}" \
        --stats "${dumpdir}/stats.joblib" \
        --outdir "${expdir}_cyclic" \
        --config "${cyclic_conf}" \
        --model-axis "${model_axis}" \
        --init-checkpoint "${ckpt}" \
        | tee "${expdir}_cyclic/train.log"
fi

if [ "${stage}" -le 8 ] && [ "${stop_stage}" -ge 8 ]; then
    echo "stage 8: decode with the cyclic model (${n_jobs} shards)"
    ckpt="${checkpoint:-$(latest_ckpt ${expdir}_cyclic)}"
    for split in ${dev_set} ${eval_set}; do
        mkdir -p "${expdir}_cyclic/decoded/${split}"
        ${decode_cmd:-utils/launch.sh} --array "1:${n_jobs}" \
            "${expdir}_cyclic/decoded/decode.${split}.JOB.log" \
            python -m serenade_tpu.bin.ssc_decode${suffix} \
                --dumpdir "${dumpdir}/${split}" \
                --stats "${dumpdir}/stats.joblib" \
                --ref-dict "${ref_dict}" \
                --outdir "${expdir}_cyclic/decoded/${split}" \
                --checkpoint "${ckpt}" \
                --batch-size "${decode_batch_size}" \
                --data-axis "${decode_data_axis}" \
                --num-shards "${n_jobs}" --shard JOB \
            || { cat "${expdir}_cyclic/decoded/decode.${split}."*.log; exit 1; }
    done
fi

if [ "${stage}" -le 9 ] && [ "${stop_stage}" -ge 9 ]; then
    echo "stage 9: SiFiGAN post-processing"
    post_args=()
    # released torch .pkl OR an orbax dir from serenade-vocoder-train
    # --vocoder-type sifigan; random weights (smoke only) when absent
    [ -e "${sifigan_ckpt}" ] && post_args+=(--checkpoint-path "${sifigan_ckpt}")
    [ -f "${sifigan_stats}" ] && post_args+=(--stats "${sifigan_stats}")
    [ -n "${sifigan_conf}" ] && post_args+=(--config "${sifigan_conf}")
    for split in ${dev_set} ${eval_set}; do
        python -m serenade_tpu.bin.ssc_postprocessing \
            --in-dir "${expdir}_cyclic/decoded/${split}" \
            "${post_args[@]+"${post_args[@]}"}"
    done
fi

if [ "${stage}" -le 10 ] && [ "${stop_stage}" -ge 10 ]; then
    echo "stage 10: objective evaluation"
    for split in ${dev_set} ${eval_set}; do
        tgt_args=(--target-scp "data/${split}/wav.scp")
        [ -n "${eval_target_dir}" ] \
            && tgt_args=(--target-dir "${eval_target_dir}")
        # prefer the cyclic model's decodes (the final output) when present
        for dir in "${expdir}_cyclic/decoded/${split}" \
                   "${expdir}/decoded/${split}"; do
            [ -d "${dir}" ] || continue
            python -m serenade_tpu.bin.evaluate \
                --converted-dir "${dir}" "${tgt_args[@]}" \
                --out "${dir}/eval.json"
            break
        done
    done
fi

echo "recipe finished"
