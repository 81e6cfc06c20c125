#!/usr/bin/env bash
# Slurm eval launcher shim (reference: tools/slurm_test.sh). One task per
# host; each task drives its local TPU chips through the GSPMD mesh (no
# per-chip processes, no --gres=gpu). Usage:
#   tools/slurm_test.sh PARTITION JOB CONFIG CHECKPOINT [ARGS]
# SRUN_ARGS is honored like the reference's.
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4
SRUN_ARGS=${SRUN_ARGS:-""}
srun -p "$PARTITION" --job-name="$JOB_NAME" --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
