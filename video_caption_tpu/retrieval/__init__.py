"""Retrieval stack (reference: scripts/extract_features.py, build_index*.py,
eval_retrieval.py, query_video.py): frozen-encoder feature extraction,
inner-product index (faiss when available, exact numpy otherwise),
Recall@K/MRR evaluation, and mp4 query."""
