"""GET /health (reference: server/routes/health.py:8-11)."""
from __future__ import annotations

from fastapi import APIRouter

from video_caption_tpu.server.schemas import HealthResponse

router = APIRouter()


@router.get("/health", response_model=HealthResponse)
def health() -> HealthResponse:
    return HealthResponse(status="ok")
