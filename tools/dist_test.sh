#!/usr/bin/env bash
# Launcher-parity shim (reference: tools/dist_test.sh launched
# torch.distributed with one process per GPU, args CONFIG CHECKPOINT
# NGPUS ...). On TPU one process drives ALL local chips through the
# GSPMD mesh, so this runs tools/test.py directly; NGPUS is accepted
# and ignored (chip count is discovered from the runtime). Multi-host:
# start this same script on every host with the jax.distributed
# coordinator env vars set (see docs/parallelism.md).
CONFIG=$1
CHECKPOINT=$2
NGPUS=${3:-}
shift || true
shift || true
shift || true
exec python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
