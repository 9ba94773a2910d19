#!/usr/bin/env bash
# App-stack launcher (reference: scripts/start_app_stack.ps1): backend on
# :8001 and the Chainlit frontend on :8000, each with tee'd logs.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs

echo "[stack] starting backend on :8001"
python -m video_caption_tpu.cli.serve --port 8001 2>&1 | tee logs/backend.log &
BACKEND_PID=$!

if python -c "import chainlit" 2>/dev/null; then
  echo "[stack] starting chainlit frontend on :8000"
  VIDEO_CAPTION_BACKEND_URL=http://127.0.0.1:8001 \
    chainlit run video_caption_tpu/frontend/chainlit_app.py --port 8000 2>&1 | tee logs/frontend.log &
  FRONTEND_PID=$!
else
  echo "[stack] chainlit not installed; backend only (REST client still works)"
  FRONTEND_PID=""
fi

trap 'kill $BACKEND_PID $FRONTEND_PID 2>/dev/null || true' EXIT
wait
