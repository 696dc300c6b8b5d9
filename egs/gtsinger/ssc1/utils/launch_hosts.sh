#!/usr/bin/env bash
# Multi-host training launcher — the `torchrun --nnodes` counterpart
# (reference run.sh:113-117 + ssc_train.py:167-189) for a TPU pod slice or
# CPU test cluster.
#
# Usage:
#   launch_hosts.sh --hosts "h0 h1 h2 h3" [--port 7821] -- CMD [ARGS...]
#
# Starts CMD once per host over ssh with the JAX distributed env set:
#   JAX_COORDINATOR_ADDRESS=<first host>:<port>
#   JAX_NUM_PROCESSES=<n hosts>   JAX_PROCESS_ID=<host index>
# The trainer calls serenade_tpu.parallel.maybe_init_distributed(), which
# reads exactly these variables.  On Cloud TPU pods prefer the provider's
# per-worker launcher; jax auto-detects the topology there and these
# variables are unnecessary.
set -uo pipefail

hosts=""
port=7821
while [ $# -gt 0 ]; do
    case "$1" in
        --hosts) hosts="$2"; shift 2 ;;
        --port) port="$2"; shift 2 ;;
        --) shift; break ;;
        *) break ;;
    esac
done
read -r -a host_arr <<< "${hosts}"
n=${#host_arr[@]}
[ "${n}" -gt 0 ] || { echo "launch_hosts.sh: --hosts required" >&2; exit 2; }
[ $# -ge 1 ] || { echo "launch_hosts.sh: no command given" >&2; exit 2; }

coord="${host_arr[0]}:${port}"
pids=()
for i in $(seq 0 $((n - 1))); do
    host="${host_arr[$i]}"
    env_str="JAX_COORDINATOR_ADDRESS=${coord} JAX_NUM_PROCESSES=${n} JAX_PROCESS_ID=${i}"
    if [ "${host}" = "localhost" ] || [ "${host}" = "127.0.0.1" ]; then
        ( cd "${PWD}" && eval "${env_str} $(printf '%q ' "$@")" ) &
    else
        # shellcheck disable=SC2029
        ssh -o BatchMode=yes "${host}" \
            "cd $(printf '%q' "${PWD}") && ${env_str} $(printf '%q ' "$@")" &
    fi
    pids+=($!)
done

fail=0
for p in "${pids[@]}"; do wait "${p}" || fail=1; done
exit "${fail}"
