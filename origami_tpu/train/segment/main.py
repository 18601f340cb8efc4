"""Training CLI: GT tile generation + on-TPU U-Net training.

`gen` mirrors the reference's training-data generation entry
(origami/train/segment/main.py); `train` replaces the external
bbz-segment training with the in-repo mesh trainer, writing model
directories that detect.segment loads directly.
"""

from __future__ import annotations

import json
from pathlib import Path

import click
import numpy as np


@click.group()
def cli():
    """Segmentation training pipeline."""


@cli.command()
@click.argument("corpus", type=click.Path(exists=True), required=True)
@click.option("-o", "--output", type=click.Path(), required=True)
@click.option("--kind", type=click.Choice(["region", "separator"]),
              default="region")
@click.option("--labels-spec", type=click.Path(exists=True), default=None,
              help="LabelSet JSON (defaults to the BBZ contract)")
@click.option("--full-width", type=int, default=1280)
@click.option("--full-height", type=int, default=2400)
@click.option("--tile-width", type=int, default=1280)
@click.option("--tile-height", type=int, default=896)
@click.option("--augmentations", type=int, default=2,
              help="variants per page (1 = no warp augmentation)")
def gen(corpus, output, kind, labels_spec, full_width, full_height,
        tile_width, tile_height, augmentations):
    """Generate training tiles from CORPUS (images + label PNGs)."""
    from origami_tpu.train.segment.data import TileDataset
    from origami_tpu.train.segment.labels import (
        LabelSet, DEFAULT_BBZ_SPEC)
    label_set = LabelSet(labels_spec or DEFAULT_BBZ_SPEC)
    ds = TileDataset(corpus, label_set, kind,
                     full_size=(full_width, full_height),
                     tile_size=(tile_width, tile_height),
                     augmentations=augmentations)
    names = ds.generate(output)
    print("wrote %d tiles to %s" % (len(names), output))


@cli.command()
@click.argument("tiles_dir", type=click.Path(exists=True), required=True)
@click.option("-o", "--output", type=click.Path(), required=True,
              help="model directory to write")
@click.option("--kind", type=click.Choice(["region", "separator"]),
              default="region")
@click.option("--steps", type=int, default=2000)
@click.option("--batch-size", type=int, default=8)
@click.option("--width", type=float, default=None,
              help="feature width multiplier (defaults per kind)")
@click.option("--s2d", type=int, default=None,
              help="space-to-depth stem factor (defaults per kind)")
@click.option("--learning-rate", type=float, default=3e-4)
@click.option("--fold", type=int, default=0,
              help="validation fold to hold out")
@click.option("--seed", type=int, default=0)
def train(tiles_dir, output, kind, steps, batch_size, width, s2d,
          learning_rate, fold, seed):
    """Train a segmentation U-Net on generated tiles."""
    import jax.numpy as jnp
    from origami_tpu.train.segment.data import load_tile_batch
    from origami_tpu.train.segment.train import (
        SegmentationTrainer, TrainConfig)
    from origami_tpu.parallel.mesh import make_mesh

    tiles_dir = Path(tiles_dir)
    codes = json.loads((tiles_dir / "codes.json").read_text())
    weights = json.loads((tiles_dir / "weights.json").read_text())
    folds = json.loads((tiles_dir / "folds.json").read_text())["folds"]
    valid_pages = set(folds[fold % len(folds)])

    all_names = sorted(p.stem for p in tiles_dir.glob("*.png")
                       if not p.name.endswith(".labels.png"))
    train_names = [n for n in all_names
                   if n.split(".")[0] not in valid_pages]
    if not train_names:
        raise click.UsageError("no training tiles found")

    # probe tile size from the first tile
    import PIL.Image
    probe = np.asarray(PIL.Image.open(
        str(tiles_dir / (train_names[0] + ".png"))))
    tile_hw = probe.shape[:2]

    # per-kind production defaults (docs/performance.md)
    if s2d is None:
        s2d = 4 if kind == "region" else 2
    if width is None:
        width = 2.0 if kind == "region" else 1.0
    cfg = TrainConfig(num_classes=len(codes), width=width, s2d=s2d,
                      tile_hw=tile_hw, learning_rate=learning_rate,
                      steps=steps)
    trainer = SegmentationTrainer(cfg, mesh=make_mesh(), seed=seed)
    import jax
    trainer_weights = jnp.asarray(weights["weights"], jnp.float32)

    rng = np.random.default_rng(seed)
    for step in range(steps):
        batch_names = [train_names[i] for i in rng.integers(
            0, len(train_names), batch_size)]
        images, labels = load_tile_batch(tiles_dir, batch_names, tile_hw)
        loss = trainer.train_step(images, labels)
        if step % 50 == 0:
            print("step %d loss %.4f" % (step, loss), flush=True)

    meta = dict(
        kind="unet", type=kind, classes=sorted(codes, key=codes.get),
        background="BACKGROUND", full_size=[probe.shape[1],
                                            probe.shape[0] * 2],
        tile_size=[probe.shape[1], probe.shape[0]], tile_beta=50,
        width=width, s2d=s2d, channels=1, version=1)
    trainer.save(output, meta)
    print("saved model to %s" % output)


if __name__ == "__main__":
    cli()
