"""Frontend layer (reference: frontend/) — REST client + Chainlit chat app.
Layering rule preserved: NO model/jax/inference imports here; the frontend
talks to the backend over HTTP only (frontend/chainlit_app.py:6-8)."""
