#!/usr/bin/env bash
# Launcher-parity shim (reference: tools/dist_train.sh used
# torch.distributed.launch with one process per GPU). On TPU one process
# drives ALL local chips through the GSPMD mesh, so this simply runs
# tools/train.py; NGPUS is accepted and ignored (chip count is discovered
# from the runtime). Multi-host: start this same script on every host with
# jax.distributed coordinator env vars set.
CONFIG=$1
NGPUS=${2:-}
shift || true
shift || true
exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
