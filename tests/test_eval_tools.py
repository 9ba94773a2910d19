"""Pure-logic tests for the eval/tooling stack: BLEU regrouping, best-of
scoring, hybrid quality gate, human-eval bucketing, benchmark report
writers, coverage repair, retrieval index + Recall/MRR."""
import csv
import json
from pathlib import Path

import numpy as np
import pytest


# --- BLEU -------------------------------------------------------------------

def test_regroup_references_pads_with_first():
    from video_caption_tpu.eval.bleu import regroup_references

    out = regroup_references([["a1", "a2"], ["b1"]])
    assert out == [["a1", "b1"], ["a2", "b1"]]


def test_corpus_bleu_perfect_match_is_100():
    from video_caption_tpu.eval.bleu import corpus_bleu

    hyp = ["a man is riding a horse", "a dog runs fast"]
    refs = [["a man is riding a horse"], ["a dog runs fast"]]
    assert corpus_bleu(hyp, refs) == pytest.approx(100.0, abs=0.1)


def test_nltk_bleu4_range():
    from video_caption_tpu.eval.bleu import nltk_bleu4

    score = nltk_bleu4(["a man rides a horse"], [["a man rides a horse"]])
    assert 0.9 < score <= 1.0


# --- bestof -----------------------------------------------------------------

def test_bestof_rejects_bad_content():
    from video_caption_tpu.tools.batch_bestof import pick_best, score_sentence

    good = "A man is riding a horse in the park."
    bad = "Subscribe to my youtube channel for more."
    assert score_sentence(bad) == -100.0
    assert pick_best([bad, good]) == good


def test_bestof_length_peak():
    from video_caption_tpu.tools.batch_bestof import score_sentence

    thirteen = "a " * 12 + "walk"      # 13 words incl. a verb hint
    three = "a man sits"
    assert score_sentence(thirteen) > score_sentence(three)


# --- hybrid gate -------------------------------------------------------------

def test_is_bad_caption_reasons():
    from video_caption_tpu.tools.hybrid_infer import is_bad_caption

    assert is_bad_caption("")[1] == "empty"
    assert is_bad_caption("short")[1] == "too_short"
    assert is_bad_caption("see https://x.co for info")[1] == "url_like"
    assert is_bad_caption("copyright 2024 somebody")[1] == "boilerplate"
    assert is_bad_caption("1234 5678 90!!")[1] == "low_alpha_ratio"
    assert is_bad_caption("the man man man walks by")[1] == "repetition"
    assert is_bad_caption("A man is riding a horse.")[1] == "ok"


def test_pick_best_prefers_s3():
    from video_caption_tpu.tools.hybrid_infer import pick_best_from_ours

    key, text = pick_best_from_ours({
        "S1": "A man is riding a horse.",
        "S2": "A woman is cooking food.",
        "S3": "A child is playing piano.",
    })
    assert key == "S3"
    key2, _ = pick_best_from_ours({"S1": "A man is riding a horse.", "S2": "", "S3": "bad"})
    assert key2 == "S1"


def test_hybrid_fallback_provenance(tmp_path):
    from video_caption_tpu.tools.hybrid_infer import hybrid_caption

    class FakeEngine:
        def infer(self, frames_dir):
            class R:
                @staticmethod
                def to_api_dict():
                    return {"S1": "", "S2": "", "S3": "",
                            "BEST": {"key": "S1", "text": ""}}
            return R()

    def fallback(frames_dir):
        return "A person is doing something interesting."
    fallback.name = "test-fallback"

    out = hybrid_caption(str(tmp_path), engine=FakeEngine(), fallback=fallback)
    assert out["USED"]["source"] == "fallback"
    assert out["BEST"]["text"].startswith("A person")


# --- human eval --------------------------------------------------------------

def test_human_eval_bucketing_and_questionnaire(tmp_path):
    from video_caption_tpu.tools.human_eval import bucket_of, sample_questionnaire, write_questionnaire

    assert bucket_of("one two three") == 0
    assert bucket_of(" ".join(["w"] * 10)) == 1
    assert bucket_of(" ".join(["w"] * 20)) == 2
    rows = [{"video_id": f"v{i}", "best_text": " ".join(["w"] * (3 + i))} for i in range(20)]
    picked = sample_questionnaire(rows, n_samples=9)
    assert len(picked) == 9
    path = write_questionnaire(picked, str(tmp_path / "q.csv"))
    with open(path) as fh:
        header = next(csv.reader(fh))
    assert header[:2] == ["video_id", "caption"]


# --- benchmark report writers -------------------------------------------------

def test_stage_stats_and_summary(tmp_path):
    from video_caption_tpu.bench.report import build_summary, stage_stats, write_bs_comparison, write_iteration_csv

    stats = stage_stats([1.0, 2.0, 3.0, 4.0])
    assert stats["mean"] == pytest.approx(2.5)
    assert stats["min"] == 1.0 and stats["max"] == 4.0
    summary = build_summary(
        {"end_to_end": [10.0, 12.0], "vit": [5.0, 6.0]},
        throughput=[0.1, 0.09],
        env={"backend": "cpu"}, config={"batch_size": 2},
        generated_tokens=[10, 12], caption_preview="a man",
    )
    assert "End_to_end_Latency" in summary and "Preprocess_CUDA_Latency" in summary
    assert summary["Throughput"]["from_mean_latency"] == pytest.approx(2 / (11.0 / 1000))
    write_iteration_csv(tmp_path / "it.csv", [{"iteration": 0, "vit_ms": 5.0}])
    write_bs_comparison(tmp_path / "bs.csv", [{"batch_size": 1, "status": "ok"},
                                              {"batch_size": 16, "status": "OOM"}])
    assert (tmp_path / "it.csv").exists() and "OOM" in (tmp_path / "bs.csv").read_text()


# --- coverage / repair --------------------------------------------------------

def test_coverage_and_repair(tmp_path):
    from PIL import Image

    from video_caption_tpu.scripts.check_coverage import check_coverage, repair_annotations

    good = tmp_path / "frames" / "vidA"
    good.mkdir(parents=True)
    Image.new("RGB", (8, 8)).save(good / "frame_00001.jpg")
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps([
        {"video_id": "vidA", "frames_dir": str(tmp_path / "stale" / "vidA")},
        {"video_id": "vidB", "frames_dir": str(tmp_path / "nope")},
    ]))
    coverage, missing = check_coverage(str(ann))
    assert coverage == 0.0 and len(missing) == 2
    stats = repair_annotations(str(ann), str(tmp_path / "frames"), str(tmp_path / "out.json"))
    assert stats == {"kept": 1, "patched": 1, "dropped": 1}
    repaired = json.loads((tmp_path / "out.json").read_text())
    assert repaired[0]["frames_dir"] == str(good)


# --- retrieval ----------------------------------------------------------------

def test_vector_index_and_retrieval_eval(tmp_path):
    from video_caption_tpu.retrieval.eval_retrieval import evaluate_retrieval
    from video_caption_tpu.retrieval.index import build_index, load_index

    rng = np.random.RandomState(0)
    feats = rng.randn(20, 16).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    ids = [f"v{i}" for i in range(20)]
    index = build_index(feats, ids, str(tmp_path), captions={"v0": "hello"})
    assert index.ntotal == 20
    loaded, meta = load_index(str(tmp_path))
    assert meta[0] == {"video_id": "v0", "caption": "hello"}
    metrics = evaluate_retrieval(feats, ids, loaded, ids)
    assert metrics["recall@1"] == 1.0 and metrics["mrr"] == 1.0
    # perturbed queries should still mostly self-retrieve
    noisy = feats + 0.01 * rng.randn(*feats.shape).astype(np.float32)
    metrics2 = evaluate_retrieval(noisy, ids, loaded, ids)
    assert metrics2["recall@5"] >= 0.9


# --- msvd prep helpers --------------------------------------------------------

def test_parse_annotations_and_split():
    from video_caption_tpu.scripts.prepare_msvd import default_split, parse_annotations_txt, uniform_bin_indices

    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        fh.write("vid1 a man walks\nvid1 someone strolls\nvid2 a dog barks\n\n")
        path = fh.name
    grouped = parse_annotations_txt(path)
    assert grouped == {"vid1": ["a man walks", "someone strolls"], "vid2": ["a dog barks"]}
    assert uniform_bin_indices(100, 4) == [12, 37, 62, 87]
    split = default_split([f"v{i}" for i in range(20)])
    assert set(split.values()) <= {"train", "val", "test"}
    assert list(split.values()).count("train") >= 14


def test_alias_frame_names(tmp_path):
    from PIL import Image

    from video_caption_tpu.scripts.check_coverage import alias_frame_names

    d = tmp_path / "weird"
    d.mkdir()
    for i in range(3):
        Image.new("RGB", (8, 8)).save(d / f"img_{i:03d}.jpg")
    created = alias_frame_names(str(d))
    assert created == 3
    assert len(list(d.glob("frame_*.jpg"))) == 3
    # idempotent: canonical names already exist
    assert alias_frame_names(str(d)) == 0


def test_extract_features_with_injected_encoder(tmp_path):
    import json as _json

    import jax.numpy as jnp
    from PIL import Image

    from video_caption_tpu.retrieval.features import extract_features

    records = []
    rng = np.random.RandomState(0)
    for v in range(3):
        d = tmp_path / f"v{v}"
        d.mkdir()
        for i in range(2):
            Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
                d / f"frame_{i:05d}.jpg"
            )
        records.append({"video_id": f"v{v}", "captions": ["c"], "frames_dir": str(d)})
    ann = tmp_path / "ann.json"
    ann.write_text(_json.dumps(records))

    def fake_encoder(videos):  # [B,T,3,H,W] -> [B,4]
        return jnp.mean(videos, axis=(1, 2, 3, 4), keepdims=False)[:, None] * jnp.ones((1, 4))

    feats, ids = extract_features(str(ann), str(tmp_path / "out"), num_frames=2,
                                  image_size=16, batch_size=2, encoder=fake_encoder)
    assert feats.shape == (3, 4)
    assert ids == ["v0", "v1", "v2"]
    norms = np.linalg.norm(feats, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    assert (tmp_path / "out" / "features.npy").exists()


def test_plot_functions(tmp_path):
    import csv as _csv

    from video_caption_tpu.scripts.plot_results import plot_benchmark_stages, plot_bleu_compare, plot_loss

    run = tmp_path / "run"
    run.mkdir()
    with (run / "events.csv").open("w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(["step", "loss"])
        for i in range(10):
            w.writerow([i + 1, 1.0 / (i + 1)])
    out = plot_loss(str(run))
    assert Path(out).exists()

    out2 = plot_bleu_compare({"corpus_bleu_a": 10.0, "corpus_bleu_b": 12.0,
                              "num_samples": 5}, str(tmp_path / "bleu.png"))
    assert Path(out2).exists()

    summary = {k: {"mean": 1.0} for k in
               ("Preprocess_Latency", "ViT_Latency", "Cross_Modal_Alignment", "GPT2_Latency")}
    sj = tmp_path / "s.json"
    sj.write_text(json.dumps(summary))
    out3 = plot_benchmark_stages(str(sj), str(tmp_path / "stages.png"))
    assert Path(out3).exists()


def test_human_eval_ratings_plot(tmp_path):
    import csv as _csv

    from video_caption_tpu.tools.human_eval import RATING_AXES, plot_ratings

    path = tmp_path / "ratings.csv"
    with path.open("w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(["video_id", "caption", *RATING_AXES])
        for i in range(6):
            w.writerow([f"v{i}", "cap", 5, 4, 3, 5])
    out = plot_ratings(str(path), str(tmp_path / "r.png"))
    assert Path(out).exists()
