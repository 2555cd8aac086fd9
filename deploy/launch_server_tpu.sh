#!/usr/bin/env bash
# TPU serving launch (reference analog: demo/launch_model_vllm.sh).
# Usage: ./deploy/launch_server_tpu.sh [WEIGHTS_DIR] [PORT]
set -euo pipefail

WEIGHTS="${1:-./weights/DotsOCR}"
PORT="${2:-8000}"

exec python -m dots_ocr_tpu.serve.server \
  --weights "$WEIGHTS" \
  --engine continuous \
  --num-pages "${NUM_PAGES:-2048}" \
  --page-size "${PAGE_SIZE:-256}" \
  --max-slots "${MAX_SLOTS:-16}" \
  --steps-per-sync "${STEPS_PER_SYNC:-16}" \
  --port "$PORT"
