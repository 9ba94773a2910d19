"""Quality evaluation: BLEU A/B compare, decode-grid ablation, simple
BLEU-4, retrieval Recall@K/MRR (reference: scripts/eval_compare.py,
ablate_decode.py, experiments/eval_bleu_simple.py, eval_retrieval.py)."""
