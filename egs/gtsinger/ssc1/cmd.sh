# Job-backend selection (reference cmd.sh:31-92 role).
#
# Stages communicate only through the filesystem, so any launcher that
# preserves the working directory works.  Pick a backend for array jobs
# (feature extraction, decoding) by setting `backend` below or in the
# environment; utils/launch.sh implements the run.pl/slurm.pl semantics.
#
#   local  — background subshells on this host (default)
#   slurm  — one srun task per array element (run inside an allocation)
#   ssh    — round-robin over ${job_hosts}
backend="${backend:-local}"
job_hosts="${job_hosts:-}"
# launch.sh reads hosts from the environment — survives unquoted
# ${train_cmd} expansion (a quoted --hosts "h1 h2" would be word-split)
export LAUNCH_HOSTS="${job_hosts}"

export train_cmd="utils/launch.sh --backend ${backend}"
# decode is device-bound: one TPU chip is process-exclusive, so local
# decode shards run serially (cluster backends fan out across hosts)
if [ "${backend}" = "local" ]; then
    export decode_cmd="utils/launch.sh --backend local --max-parallel ${decode_parallel:-1}"
else
    export decode_cmd="utils/launch.sh --backend ${backend}"
fi
# multi-host training (TPU pod / CPU cluster): see utils/launch_hosts.sh
export hosts_cmd="utils/launch_hosts.sh"
