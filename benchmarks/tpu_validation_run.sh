#!/bin/bash
# TPU validation queue — run when the axon relay (port 8082) is reachable.
#
# Serialized (one TPU client at a time), generous timeouts, NEVER
# timeout-kill a TPU-touching python (a client killed mid-RPC wedges the
# relay for ~30 min; see docs/DESIGN.md).  Each step appends to
# benchmarks/tpu_validation.log; inspect gates before flipping defaults:
#
#   1. pallas_validate --batches 40  -> all batches exact, no runtime
#      errors  => flip HybridSearchEngine use_pallas default + rank CLI
#   2. topk_profile                  -> count_ge A/B; if faster, default
#      ILI_TOPK_PALLAS=1
#   3. latency_bench                 -> refresh p50/p99 in BENCHMARKS.md
#   4. llama_decode_bench --precision int4 --kv_quant int8 --batch 256
#      (then 320)                    -> record seqs/s, HBM headroom
#   5. index_build_bench (store pipeline, full TPU rerun)
#   6. query_bench 1M + 8.8M        -> refresh headline q/s
#
# Usage: bash benchmarks/tpu_validation_run.sh [step...]  (default: 1 2 3)

set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/tpu_validation.log
steps=("${@:-1 2 3}")

run() {
  echo "=== $(date -Is) $*" | tee -a "$LOG"
  "$@" 2>&1 | tee -a "$LOG"
  echo "=== rc=$? $(date -Is)" | tee -a "$LOG"
}

for s in ${steps[@]}; do
  case "$s" in
    1) run python benchmarks/pallas_validate.py ;;
    2) run python benchmarks/topk_profile.py ;;
    3) run python benchmarks/latency_bench.py ;;
    4) run python benchmarks/llama_decode_bench.py --precision int4 --kv_quant int8 --batch 256 ;;
    5) run python benchmarks/index_build_bench.py ;;
    6) run python benchmarks/query_bench.py --engines hybrid_pipelined,native ;;
    *) echo "unknown step $s" ;;
  esac
done
