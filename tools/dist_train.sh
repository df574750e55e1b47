#!/usr/bin/env bash
# Multi-process training launcher (counterpart of reference
# tools/dist_train.sh, which wraps torch.distributed.launch).
#
# On a TPU pod slice each host runs one process and jax.distributed
# auto-detects the topology, so the common case is simply:
#   ./tools/dist_train.sh CONFIG
# For explicit multi-process setups (e.g. CPU testing), set NPROC and a
# coordinator: NPROC=4 COORDINATOR_ADDRESS=host:1234 ./tools/dist_train.sh CONFIG
set -euo pipefail
CONFIG=$1
shift || true
NPROC=${NPROC:-1}
PORT=${PORT:-$((29400 + RANDOM % 1000))}
if [ "$NPROC" -le 1 ]; then
    exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
fi
COORD=${COORDINATOR_ADDRESS:-127.0.0.1:$PORT}
pids=()
for ((i = 0; i < NPROC; i++)); do
    COORDINATOR_ADDRESS=$COORD NUM_PROCESSES=$NPROC PROCESS_ID=$i \
        python "$(dirname "$0")/train.py" "$CONFIG" "$@" &
    pids+=($!)
done
for pid in "${pids[@]}"; do wait "$pid"; done
