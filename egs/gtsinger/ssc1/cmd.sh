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

launch_opts=(--backend "${backend}")
[ -n "${job_hosts}" ] && launch_opts+=(--hosts "${job_hosts}")

export train_cmd="utils/launch.sh ${launch_opts[*]}"
export decode_cmd="utils/launch.sh ${launch_opts[*]}"
# multi-host training (TPU pod / CPU cluster): see utils/launch_hosts.sh
export hosts_cmd="utils/launch_hosts.sh"
