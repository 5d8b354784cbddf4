#!/bin/sh
# Launch training (counterpart of reference core/unopose/train_unopose.sh).
#   scripts/train_unopose.sh [config-module:fn] [overrides...]
# Multi-host: export JAX_COORDINATOR_ADDRESS, run once per host.
set -e
cd "$(dirname "$0")/.."
CFG=${1:-unopose_tpu.configs.main_cfg:get_cfg}
shift 2>/dev/null || true
exec python -m unopose_tpu.main_unopose --config "$CFG" "$@"
