"""CLI surface health: every entry point imports and parses its arguments
(the reference's import-health check idea, check_project_env.ps1:20-47)."""
import importlib

import pytest

CLI_MODULES = [
    "video_caption_tpu.cli.infer_once",
    "video_caption_tpu.cli.caption_video",
    "video_caption_tpu.cli.serve",
    "video_caption_tpu.cli.train",
    "video_caption_tpu.cli.train_full",
    "video_caption_tpu.cli.train_caption_mapper",
    "video_caption_tpu.cli.train_decoder_only",
    "video_caption_tpu.cli.check_env",
    "video_caption_tpu.tools.batch_infer",
    "video_caption_tpu.tools.batch_bestof",
    "video_caption_tpu.tools.hybrid_infer",
    "video_caption_tpu.tools.human_eval",
    "video_caption_tpu.tools.debug_chain",
    "video_caption_tpu.eval.eval_compare",
    "video_caption_tpu.eval.ablate_decode",
    "video_caption_tpu.retrieval.eval_retrieval",
    "video_caption_tpu.retrieval.query_video",
    "video_caption_tpu.scripts.prepare_msvd",
    "video_caption_tpu.scripts.extract_frames",
    "video_caption_tpu.scripts.check_coverage",
    "video_caption_tpu.scripts.plot_results",
    "video_caption_tpu.scripts.msvd_fetch_youtube",
    "video_caption_tpu.bench.benchmark",
    "video_caption_tpu.bench.profile",
    "video_caption_tpu.bench.accuracy_alignment",
]


@pytest.mark.parametrize("module", CLI_MODULES)
def test_cli_imports(module):
    mod = importlib.import_module(module)
    assert hasattr(mod, "main")


def test_infer_once_parser_defaults():
    from video_caption_tpu.cli.infer_once import build_parser

    args = build_parser().parse_args(["--frames_dir", "/tmp/x"])
    assert args.num_frames == 8
    assert args.preset1 == "precise" and args.preset3 == "natural"
    assert args.prompt2.startswith("State the main action")


def test_check_env_runs():
    from video_caption_tpu.cli.check_env import main

    assert main([]) == 0


def test_probes_memory_runs():
    """The reserved memory-probe placeholder (core/scripts/memory_probe.py:5)
    is implemented; the snapshot path must run on any backend."""
    from video_caption_tpu.memory import MemoryManager

    s = MemoryManager().snapshot()
    # CPU backend may not expose memory stats — fields are Optional
    assert hasattr(s, "bytes_in_use") and hasattr(s, "peak_bytes_in_use")


def test_probes_cli_parser():
    import pytest

    from video_caption_tpu.bench import probes

    with pytest.raises(SystemExit):
        probes.main(["bogus"])  # invalid choice exits via argparse
