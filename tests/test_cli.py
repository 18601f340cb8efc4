"""CLI wiring smoke tests: every batch/tool command parses --help."""

import pytest
from click.testing import CliRunner


CLIS = [
    ("origami_tpu.batch.detect.segment", "segment"),
    ("origami_tpu.batch.detect.contours", "extract_contours"),
    ("origami_tpu.batch.detect.flow", "detect_flow"),
    ("origami_tpu.batch.detect.dewarp", "dewarp"),
    ("origami_tpu.batch.detect.layout", "detect_layout"),
    ("origami_tpu.batch.detect.lines", "detect_lines"),
    ("origami_tpu.batch.detect.order", "reading_order"),
    ("origami_tpu.batch.detect.ocr", "run_ocr"),
    ("origami_tpu.batch.detect.compose", "compose"),
    ("origami_tpu.batch.utils.stats", "stats"),
    ("origami_tpu.batch.utils.reset", "reset"),
    ("origami_tpu.batch.utils.cleanup", "cleanup"),
    ("origami_tpu.batch.utils.sample", "sample"),
    ("origami_tpu.batch.utils.evaluate", "evaluate"),
    ("origami_tpu.batch.utils.signature", "signature"),
    ("origami_tpu.batch.utils.thumbnail", "thumbnail"),
    ("origami_tpu.batch.utils.rtext", "rtext"),
    ("origami_tpu.batch.utils.dewarp", "dewarp_images"),
    ("origami_tpu.batch.utils.pdf", "pdf"),
    ("origami_tpu.batch.utils.segment", "convert_segmentation"),
    ("origami_tpu.batch.utils.compare", "compare"),
    ("origami_tpu.batch.annotate.contours", "annotate_contours"),
    ("origami_tpu.batch.annotate.flow", "annotate_flow"),
    ("origami_tpu.batch.annotate.grid", "annotate_grid"),
    ("origami_tpu.batch.annotate.layout", "annotate_layout"),
    ("origami_tpu.batch.annotate.lines", "annotate_lines"),
    ("origami_tpu.batch.export.lines", "export_lines"),
    ("origami_tpu.batch.export.pagexml", "export_pagexml"),
    ("origami_tpu.batch.remote.runner", "remote"),
    ("origami_tpu.tool.harmonize", "harmonize"),
    ("origami_tpu.tool.annotate", "annotate"),
    ("origami_tpu.tool.annotate_web", "serve"),
    ("origami_tpu.tool.pick_web", "serve"),
    ("origami_tpu.tool.cluster_web", "serve"),
    ("origami_tpu.tool.xycut_web", "serve"),
    ("origami_tpu.tool.pick", "pick"),
    ("origami_tpu.tool.sample", "sample_lines"),
    ("origami_tpu.tool.export", "export"),
    ("origami_tpu.tool.merge", "merge_db"),
    ("origami_tpu.tool.migrate", "migrate"),
    ("origami_tpu.tool.cluster", "cluster"),
    ("origami_tpu.tool.xycut", "xycut_debug"),
    ("origami_tpu.train.segment.main", "cli"),
    ("origami_tpu.train.segment.binarize", "binarize"),
]


@pytest.mark.parametrize("module,command", CLIS,
                         ids=[m for m, _ in CLIS])
def test_cli_help(module, command):
    import importlib
    mod = importlib.import_module(module)
    cmd = getattr(mod, command)
    result = CliRunner().invoke(cmd, ["--help"])
    assert result.exit_code == 0, result.output
