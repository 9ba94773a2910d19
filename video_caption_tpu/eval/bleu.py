"""BLEU scoring utilities.

Reference parity:
- corpus BLEU via sacrebleu with R x N reference regrouping
  (scripts/eval_compare.py:91-110): references are transposed into
  per-position lists padded with the first caption,
- per-sample sentence BLEU-1,
- NLTK corpus BLEU-4 (experiments/eval_bleu_simple.py:17-23).
"""
from __future__ import annotations

from typing import Dict, List, Sequence


def regroup_references(refs_per_sample: Sequence[Sequence[str]]) -> List[List[str]]:
    """[[r1a, r1b], [r2a], ...] -> sacrebleu shape [[r1a, r2a,...], [r1b, r1a-pad,...]]."""
    max_refs = max(len(r) for r in refs_per_sample)
    out: List[List[str]] = []
    for j in range(max_refs):
        out.append([refs[j] if j < len(refs) else refs[0] for refs in refs_per_sample])
    return out


def corpus_bleu(hypotheses: Sequence[str], refs_per_sample: Sequence[Sequence[str]]) -> float:
    import sacrebleu

    refs = regroup_references(refs_per_sample)
    return float(sacrebleu.corpus_bleu(list(hypotheses), refs).score)


def sentence_bleu1(hypothesis: str, references: Sequence[str]) -> float:
    import sacrebleu

    metric = sacrebleu.BLEU(max_ngram_order=1, effective_order=True)
    return float(metric.sentence_score(hypothesis, list(references)).score)


def nltk_bleu4(hypotheses: Sequence[str], refs_per_sample: Sequence[Sequence[str]]) -> float:
    from nltk.translate.bleu_score import SmoothingFunction, corpus_bleu as nltk_corpus

    hyp_tokens = [h.lower().split() for h in hypotheses]
    ref_tokens = [[r.lower().split() for r in refs] for refs in refs_per_sample]
    return float(
        nltk_corpus(ref_tokens, hyp_tokens, smoothing_function=SmoothingFunction().method1)
    )


def evaluate_pairs(results: Sequence[Dict]) -> Dict[str, float]:
    """results: [{"hyp": str, "refs": [str, ...]}] -> aggregate metrics."""
    hyps = [r["hyp"] for r in results]
    refs = [r["refs"] for r in results]
    return {
        "corpus_bleu": corpus_bleu(hyps, refs),
        "bleu4_nltk": nltk_bleu4(hyps, refs),
        "mean_sentence_bleu1": sum(sentence_bleu1(h, rr) for h, rr in zip(hyps, refs)) / max(len(hyps), 1),
        "num_samples": len(hyps),
    }
