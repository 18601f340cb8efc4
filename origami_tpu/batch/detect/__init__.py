"""The nine detect stages; run as `python -m origami_tpu.batch.detect.<stage> DATA`."""
