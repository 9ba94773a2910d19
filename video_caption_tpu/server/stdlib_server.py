"""Dependency-free HTTP server implementing the same routes as the FastAPI
app (POST /infer, POST /api/v1/infer, GET /health) on pure stdlib.

Exists because this framework must serve in hermetic images where
fastapi/uvicorn are unavailable (the reference gates those deps at
core/env.py:29-33 and simply refuses; we degrade gracefully instead).
Error mapping matches server/routes/inference.py: FileNotFoundError -> 400,
anything else -> 500.
"""
from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

log = logging.getLogger(__name__)


def _infer_payload(body: dict) -> dict:
    from video_caption_tpu.server.schemas import InferRequest
    from video_caption_tpu.server.services.inference_service import INFERENCE_SERVICE

    req = InferRequest(**body)
    return INFERENCE_SERVICE.infer(req)


class _Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, payload: dict) -> None:
        data = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.send_header("Access-Control-Allow-Origin", "*")
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, fmt, *args):  # route through logging, not stderr
        log.info("%s - %s", self.address_string(), fmt % args)

    def do_GET(self):
        if self.path.rstrip("/") in ("", "/api/v1") or self.path in ("/health", "/api/v1/health"):
            self._send(200, {"status": "ok"})
        else:
            self._send(404, {"detail": "not found"})

    def do_POST(self):
        if self.path not in ("/infer", "/api/v1/infer"):
            self._send(404, {"detail": "not found"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            self._send(200, _infer_payload(body))
        except FileNotFoundError as err:
            self._send(400, {"detail": str(err)})
        except (ValueError, TypeError) as err:
            self._send(422, {"detail": str(err)})
        except Exception as err:  # pragma: no cover
            log.exception("inference failed")
            self._send(500, {"detail": str(err)})


class _Server(ThreadingHTTPServer):
    # socketserver's default listen backlog (request_queue_size) is 5: under
    # bursty load at tens of QPS the SYN queue overflows and clients see
    # connection resets — measured as the 2 errors that failed the 48 QPS
    # sweep rung (reports/serving_load_sweep.json, 2026-08-19).
    request_queue_size = 128


class StdlibServer:
    """Threaded HTTP server; ``serve_forever`` blocks, ``start`` runs in a
    daemon thread (used by tests and the CLI fallback)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 8001):
        self.httpd = _Server((host, port), _Handler)
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "StdlibServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        log.info("stdlib server listening on %s:%d", self.host, self.port)
        self.httpd.serve_forever()

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
