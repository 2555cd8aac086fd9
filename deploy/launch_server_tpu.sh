#!/usr/bin/env bash
# TPU serving launch (reference analog: demo/launch_model_vllm.sh).
# Usage: ./deploy/launch_server_tpu.sh [WEIGHTS_DIR] [PORT]
#
# Env knobs (measured defaults, PERF.md round-2 matrix):
#   PAGE_SIZE=128      KV page size — end-to-end sweet spot on v5e, and
#                      the int8-KV kernel's required scale alignment
#   KV_DTYPE=bf16      set int8 for the 14.4k+24k capacity envelope
#                      (also FASTER at long contexts; needs PAGE_SIZE%128==0)
#   QUANTIZE=          set int8 for weight-only decoder quantization
#   SPECULATE_K=3      n-gram speculative decoding (exact for greedy,
#                      distribution-preserving for sampled incl. top_p<1);
#                      0 disables
#   PREFILL_CHUNK=2048 chunked prefill size (decode interleaves)
#   WARMUP=full        'full' blocks until every program compiles before
#                      binding; 'background' binds immediately and warms
#                      on idle engine ticks (near-zero startup outage —
#                      first requests may wait one compile each)
set -euo pipefail

WEIGHTS="${1:-./weights/DotsOCR}"
PORT="${2:-8000}"

EXTRA=()
[[ -n "${QUANTIZE:-}" ]] && EXTRA+=(--quantize "$QUANTIZE")

exec python -m dots_ocr_tpu.serve.server \
  --weights "$WEIGHTS" \
  --engine continuous \
  --num-pages "${NUM_PAGES:-2048}" \
  --page-size "${PAGE_SIZE:-128}" \
  --kv-cache-dtype "${KV_DTYPE:-bf16}" \
  --max-slots "${MAX_SLOTS:-16}" \
  --steps-per-sync "${STEPS_PER_SYNC:-16}" \
  --prefill-chunk-tokens "${PREFILL_CHUNK:-2048}" \
  --speculate-k "${SPECULATE_K:-3}" \
  --warmup "${WARMUP:-full}" \
  ${EXTRA[@]+"${EXTRA[@]}"} \
  --port "$PORT"
