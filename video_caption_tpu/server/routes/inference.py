"""POST /infer (reference: server/routes/inference.py:9-17):
FileNotFoundError -> 400, everything else -> 500."""
from __future__ import annotations

import logging

from fastapi import APIRouter, HTTPException

from video_caption_tpu.server.schemas import InferRequest, InferResponse
from video_caption_tpu.server.services.inference_service import INFERENCE_SERVICE

log = logging.getLogger(__name__)
router = APIRouter()


@router.post("/infer", response_model=InferResponse)
def infer(req: InferRequest) -> InferResponse:
    try:
        payload = INFERENCE_SERVICE.infer(req)
    except FileNotFoundError as err:
        raise HTTPException(status_code=400, detail=str(err))
    except Exception as err:  # pragma: no cover - unexpected failure path
        log.exception("inference failed")
        raise HTTPException(status_code=500, detail=str(err))
    return InferResponse(**payload)
