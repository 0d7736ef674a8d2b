#!/usr/bin/env bash
# Launch a multi-host PyRHE-TPU run across a TPU pod slice (the role of the
# reference's commands/*.sh SGE qsub scripts, re-targeted at TPU pods).
#
# Run this same script on every host of the slice (e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command="..."`).
# jax.distributed picks up coordinator/host-id from the TPU metadata; to
# override, set COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID.
#
# Usage: scripts/tpu_pod_run.sh <config-file> [extra run_rhe.py flags...]
set -euo pipefail

CONFIG=${1:?usage: tpu_pod_run.sh <config> [flags...]}
shift || true

export PYRHE_TPU_DISTRIBUTED=1   # pyrhe_tpu.parallel.distributed init
exec python "$(dirname "$0")/../run_rhe.py" --config "$CONFIG" "$@"
