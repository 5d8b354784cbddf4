#!/bin/sh
# Run inference + write the BOP19 CSV + score it (counterpart of reference
# core/unopose/save_unopose.sh).
#   scripts/save_unopose.sh [config-module:fn] [overrides...]
set -e
cd "$(dirname "$0")/.."
CFG=${1:-unopose_tpu.configs.main_cfg:get_cfg}
shift 2>/dev/null || true
exec python -m unopose_tpu.main_unopose --config "$CFG" --eval-only "$@"
