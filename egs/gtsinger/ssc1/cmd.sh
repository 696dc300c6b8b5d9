# Job-backend selection (reference cmd.sh role).
#
# The TPU build runs stages as plain processes by default; on a cluster,
# point these at your scheduler wrapper (e.g. "srun", "qsub -sync y ...").
# Stages only communicate through the filesystem, so any launcher that
# preserves the working directory works.
export train_cmd=""
export cuda_cmd=""
export decode_cmd=""
