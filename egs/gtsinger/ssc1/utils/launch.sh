#!/usr/bin/env bash
# Array-job launcher — the Kaldi run.pl/queue.pl/slurm.pl counterpart
# (reference egs/gtsinger/ssc1/utils/{run.pl,slurm.pl}; backend selection
# reference cmd.sh:31-92).
#
# Usage:
#   launch.sh [--backend local|slurm|ssh] [--hosts "h1 h2 ..."] \
#             [--array 1:N] LOGFILE CMD [ARGS...]
#
# Every occurrence of the literal string JOB in LOGFILE and ARGS is replaced
# by the array index.  All elements run concurrently; the exit status is
# non-zero if any element fails (each element's log names the failure).
#
# Backends:
#   local  (default) background subshells on this host
#   slurm  one `srun --ntasks=1` per element (inherits the allocation)
#   ssh    round-robin elements over hosts via ssh (cwd preserved)
#
# Hosts come from --hosts "h1 h2" or the LAUNCH_HOSTS env var (the env
# form survives unquoted $train_cmd expansion in recipes).
# --max-parallel N throttles concurrency (N=1 => serial — required for
# device-bound jobs sharing one TPU chip).
set -uo pipefail

backend=local
hosts="${LAUNCH_HOSTS:-}"
array="1:1"
max_parallel=0
while [ $# -gt 0 ]; do
    case "$1" in
        --backend) backend="$2"; shift 2 ;;
        --hosts) hosts="$2"; shift 2 ;;
        --array) array="$2"; shift 2 ;;
        --max-parallel) max_parallel="$2"; shift 2 ;;
        --) shift; break ;;
        -*) echo "launch.sh: unknown option $1" >&2; exit 2 ;;
        *) break ;;
    esac
done

[ $# -ge 2 ] || { echo "usage: launch.sh [opts] LOGFILE CMD [ARGS...]" >&2; exit 2; }
logfile="$1"; shift

lo="${array%%:*}"; hi="${array##*:}"
read -r -a host_arr <<< "${hosts}"

run_element() {
    local job="$1"; shift
    local log="${logfile//JOB/${job}}"
    mkdir -p "$(dirname "${log}")"
    local cmd=()
    local a
    for a in "$@"; do cmd+=("${a//JOB/${job}}"); done
    case "${backend}" in
        local)
            "${cmd[@]}" > "${log}" 2>&1
            ;;
        slurm)
            srun --ntasks=1 --nodes=1 "${cmd[@]}" > "${log}" 2>&1
            ;;
        ssh)
            local n=${#host_arr[@]}
            [ "${n}" -gt 0 ] || { echo "launch.sh: --hosts required for ssh" >&2; return 2; }
            local host="${host_arr[$(( (job - lo) % n ))]}"
            # shellcheck disable=SC2029
            ssh -o BatchMode=yes "${host}" \
                "cd $(printf '%q' "${PWD}") && $(printf '%q ' "${cmd[@]}")" \
                > "${log}" 2>&1
            ;;
        *)
            echo "launch.sh: unknown backend '${backend}'" >&2; return 2 ;;
    esac
}

pids=()
jobs_idx=()
fail=0
for job in $(seq "${lo}" "${hi}"); do
    if [ "${max_parallel}" -gt 0 ] && [ "${#pids[@]}" -ge "${max_parallel}" ]; then
        # throttle: wait for the oldest in-flight element
        if ! wait "${pids[0]}"; then
            echo "launch.sh: element ${jobs_idx[0]} failed" \
                 "(log: ${logfile//JOB/${jobs_idx[0]}})" >&2
            fail=1
        fi
        pids=("${pids[@]:1}"); jobs_idx=("${jobs_idx[@]:1}")
    fi
    run_element "${job}" "$@" &
    pids+=($!)
    jobs_idx+=("${job}")
done

for i in "${!pids[@]}"; do
    if ! wait "${pids[$i]}"; then
        echo "launch.sh: element ${jobs_idx[$i]} failed" \
             "(log: ${logfile//JOB/${jobs_idx[$i]}})" >&2
        fail=1
    fi
done
exit "${fail}"
