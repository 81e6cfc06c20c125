#!/usr/bin/env bash
# Slurm launcher shim (reference: tools/slurm_train.sh). One task per host;
# each task drives its local TPU chips. Usage:
#   srun --ntasks=<hosts> tools/slurm_train.sh PARTITION JOB CONFIG [ARGS]
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
shift 3
srun -p "$PARTITION" --job-name="$JOB_NAME" --kill-on-bad-exit=1 \
    python "$(dirname "$0")/train.py" "$CONFIG" --auto-resume "$@"
