#!/usr/bin/env bash
# SLURM training launcher (counterpart of reference tools/slurm_train.sh,
# which wraps `srun ... tools/train.py --launcher slurm`).
#
# One task per TPU host; tools/train.py calls init_distributed() at
# startup, which sees SLURM_NTASKS > 1 and lets jax.distributed's SLURM
# cluster detection (SLURM_PROCID / SLURM_NTASKS / node list) wire the
# coordinator — no explicit address plumbing needed beyond the task
# layout.
#
# Usage:
#   [NTASKS=N] [CPUS_PER_TASK=C] [SRUN_ARGS=...] \
#     ./tools/slurm_train.sh PARTITION JOB_NAME CONFIG WORK_DIR [PY_ARGS...]
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
NTASKS=${NTASKS:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-8}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:5}

PYTHONPATH="$(dirname $0)/..":$PYTHONPATH \
srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --ntasks=${NTASKS} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/train.py ${CONFIG} --work-dir=${WORK_DIR} ${PY_ARGS}
