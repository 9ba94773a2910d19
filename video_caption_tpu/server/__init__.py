"""FastAPI serving layer (reference: server/) — same routes, same schemas:
POST /infer and /api/v1/infer, GET /health; engine registry caching one
compiled engine per distinct config; device admission queue."""
