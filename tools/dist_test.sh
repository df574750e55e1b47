#!/usr/bin/env bash
# Multi-process evaluation launcher (counterpart of reference
# tools/dist_test.sh). See tools/dist_train.sh for the env contract.
set -euo pipefail
CONFIG=$1
CHECKPOINT=$2
shift 2 || true
NPROC=${NPROC:-1}
PORT=${PORT:-$((29400 + RANDOM % 1000))}
if [ "$NPROC" -le 1 ]; then
    exec python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@"
fi
COORD=${COORDINATOR_ADDRESS:-127.0.0.1:$PORT}
pids=()
for ((i = 0; i < NPROC; i++)); do
    COORDINATOR_ADDRESS=$COORD NUM_PROCESSES=$NPROC PROCESS_ID=$i \
        python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" "$@" &
    pids+=($!)
done
for pid in "${pids[@]}"; do wait "$pid"; done
