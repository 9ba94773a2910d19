"""Legacy shim (reference: server/app.py) — ``uvicorn server.app:app``
keeps working when FastAPI is installed; otherwise ``app`` is None and the
stdlib server (video_caption_tpu.server.stdlib_server) is the fallback."""
try:
    from video_caption_tpu.server.app import *  # noqa: F401,F403
    from video_caption_tpu.server.app import app, create_app  # noqa: F401
except ModuleNotFoundError:  # fastapi absent
    app = None
    from video_caption_tpu.server.stdlib_server import *  # noqa: F401,F403
