#!/usr/bin/env bash
# TPU serving launch (reference analog: demo/launch_model_vllm.sh).
# Usage: ./deploy/launch_server_tpu.sh [WEIGHTS_DIR] [PORT]
#
# Defaults come from deploy/shipping.env — the ONE shipping config, shared
# with docker-compose.yml and bench.py. Any variable already set in the
# environment overrides the file (e.g. `QUANTIZE= ./deploy/launch_server_tpu.sh`
# for an unquantized decoder, `KV_DTYPE=int8` for the long-context capacity
# envelope, `WARMUP=background` for near-zero startup outage).
set -euo pipefail

HERE="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"

# Apply shipping.env as *defaults*: real env wins.
while IFS='=' read -r k v; do
  [[ -z "$k" || "$k" == \#* ]] && continue
  if [[ -z "${!k+x}" ]]; then
    printf -v "$k" '%s' "$v"
  fi
done < "$HERE/shipping.env"

WEIGHTS="${1:-./weights/DotsOCR}"
PORT="${2:-8000}"

# Relative cache paths resolve against the repo root, not the caller CWD.
if [[ -n "${COMPILE_CACHE:-}" && "${COMPILE_CACHE}" != /* ]]; then
  COMPILE_CACHE="$HERE/../${COMPILE_CACHE}"
fi

# PRIME_CACHE=1: seed the XLA compile cache with the full shipping program
# set (zeros weights; no checkpoint needed) before binding — turns the
# ~5-minute first-boot compile outage into a one-time deploy step
# (tools/prime_cache.py; cold ~288 s vs primed 10-30 s, PERF.md).
if [[ "${PRIME_CACHE:-0}" == "1" ]]; then
  python "$HERE/../tools/prime_cache.py" \
    --cache "${COMPILE_CACHE:-$HERE/../.cache/xla}" \
    ${WEIGHTS:+--weights "$WEIGHTS"}
fi

EXTRA=()
[[ -n "${QUANTIZE:-}" ]] && EXTRA+=(--quantize "$QUANTIZE")
[[ -n "${COMPILE_CACHE:-}" ]] && EXTRA+=(--compile-cache "$COMPILE_CACHE")
[[ -n "${VISION_ATTN:-}" ]] && EXTRA+=(--vision-attn "$VISION_ATTN")
[[ -n "${VISION_WINDOW:-}" ]] && EXTRA+=(--vision-window-patches "$VISION_WINDOW")
[[ -n "${VISION_FULL_LAYERS:-}" ]] && EXTRA+=(--vision-full-layers "$VISION_FULL_LAYERS")

exec python -m dots_ocr_tpu.serve.server \
  --weights "$WEIGHTS" \
  --engine continuous \
  --num-pages "${NUM_PAGES}" \
  --page-size "${PAGE_SIZE}" \
  --kv-cache-dtype "${KV_DTYPE}" \
  --max-slots "${MAX_SLOTS}" \
  --max-seq-tokens "${MAX_SEQ_TOKENS}" \
  --steps-per-sync "${STEPS_PER_SYNC}" \
  --prefill-chunk-tokens "${PREFILL_CHUNK}" \
  --speculate-k "${SPECULATE_K}" \
  --warmup "${WARMUP}" \
  ${EXTRA[@]+"${EXTRA[@]}"} \
  --port "$PORT"
