"""Train tiny U-Nets on synthetic GT, then run detect.segment with them:
the full trained-model path (gen -> train -> model dir -> ensemble graph
-> segment.zip) end to end."""

import json
from pathlib import Path

import numpy as np
import PIL.Image
import pytest


def _mini_page(rng, h=192, w=128):
    """Synthetic page + GT: dark text block on paper + one V separator."""
    img = np.full((h, w), 230, np.uint8)
    reg = np.full((h, w), 3, np.uint8)
    sep = np.full((h, w), 3, np.uint8)
    # text block = noisy dark area
    img[30:150, 10:60] = (rng.random((120, 50)) * 90).astype(np.uint8)
    reg[30:150, 10:60] = 0
    # separator: dark vertical rule
    img[20:170, 80:83] = 15
    sep[20:170, 80:83] = 1
    return img, reg, sep


def test_train_then_segment(tmp_path, rng):
    import jax
    from origami_tpu.models import registry
    from origami_tpu.models.unet import create_unet, ensemble_apply
    from origami_tpu.parallel.mesh import make_mesh
    from origami_tpu.train.segment.train import (
        SegmentationTrainer, TrainConfig)

    # --- train one tiny region net on repeated synthetic tiles --------
    mesh = make_mesh(model_parallel=1)
    cfg = TrainConfig(num_classes=4, width=0.125, tile_hw=(192, 128),
                      steps=60, warmup=0, learning_rate=5e-3,
                      remat=False)
    trainer = SegmentationTrainer(cfg, mesh=mesh)
    batch_img = []
    batch_lab = []
    for _ in range(4):
        img, reg, sep = _mini_page(rng)
        batch_img.append(img[..., None] / 255.0)
        batch_lab.append(reg)
    images = np.stack(batch_img).astype(np.float32)
    labels = np.stack(batch_lab).astype(np.int32)
    losses = [trainer.train_step(images, labels) for _ in range(12)]
    assert losses[-1] < losses[0]

    meta = registry.default_segmentation_meta(
        "region", full_size=(128, 192), width=0.125, s2d=1)
    trainer.save(tmp_path / "models" / "region" / "1", meta)

    # a second (fresh) member to exercise the ensemble path
    registry.init_and_save(tmp_path / "models" / "region" / "2", meta,
                           seed=7)
    sep_meta = registry.default_segmentation_meta(
        "separator", full_size=(128, 192), width=0.125, s2d=1)
    registry.init_and_save(tmp_path / "models" / "separator" / "1",
                           sep_meta)

    # --- run the segment stage with the trained models ----------------
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    img, reg, sep = _mini_page(rng)
    PIL.Image.fromarray(img).save(corpus / "p0.png")

    from origami_tpu.batch.detect.segment import SegmentationProcessor
    SegmentationProcessor(
        str(tmp_path / "models"),
        dict(lock_strategy="NONE", plain=True, target="quality")) \
        .traverse(corpus)

    from origami_tpu.core.segment import Segmentation
    out = corpus / "p0.out" / "segment.zip"
    assert out.exists()
    seg = Segmentation.open(out)
    assert {p.name for p in seg.predictions} == {"regions", "separators"}
    regions = seg.by_name("regions")
    # the trained net (dominating the 2-member vote) finds the text
    # block: TEXT predictions concentrated inside the GT region
    pred_text = regions.labels == regions.classes["TEXT"].value
    gt_text = reg == 0
    if pred_text.sum() > 0:
        inside = (pred_text & gt_text).sum() / pred_text.sum()
        assert inside > 0.5
    # and speed mode (single member) also runs
    SegmentationProcessor(
        str(tmp_path / "models"),
        dict(lock_strategy="NONE", plain=True, target="speed",
             overwrite=True)).traverse(corpus)
    assert out.exists()
