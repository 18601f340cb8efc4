#!/bin/bash
# End-to-end detect pipeline over a corpus on one TPU host.
# Usage: ./quickstart/run_pipeline.sh DATA_DIR [MODELS_DIR]
# With no MODELS_DIR the model-free heuristic segmenter and FAKE OCR run
# (useful to validate the pipeline before training models).
set -e
DATA="$1"
MODELS="${2:-heuristic}"
OCR_MODEL="${3:-FAKE}"

python -m origami_tpu.batch.detect.segment -m "$MODELS" "$DATA"
python -m origami_tpu.batch.detect.contours "$DATA"
python -m origami_tpu.batch.detect.flow "$DATA"
python -m origami_tpu.batch.detect.dewarp "$DATA"
python -m origami_tpu.batch.detect.layout "$DATA"
python -m origami_tpu.batch.detect.lines "$DATA"
python -m origami_tpu.batch.detect.order "$DATA"
python -m origami_tpu.batch.detect.ocr -m "$OCR_MODEL" "$DATA"
python -m origami_tpu.batch.detect.compose --page-xml "$DATA"
python -m origami_tpu.batch.utils.stats "$DATA"
