"""Binarized GT corpus generation (reference:
origami/train/segment/gen/binarize.py) — device Sauvola over every
corpus image into a sibling bin/ directory."""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np
import PIL.Image


def gen_binarized(corpus_dir, window_size=15):
    import jax.numpy as jnp
    from origami_tpu.ops.binarize import sauvola
    corpus_dir = Path(corpus_dir)
    bin_dir = corpus_dir.parent / "bin"
    bin_dir.mkdir(exist_ok=True)
    n = 0
    for img_path in sorted(corpus_dir.glob("*.png")):
        if ".labels." in img_path.name:
            continue
        out = bin_dir / img_path.name
        if out.exists():
            continue
        px = np.asarray(PIL.Image.open(str(img_path)).convert("L"))
        mask = np.asarray(sauvola(jnp.asarray(px), window_size))
        PIL.Image.fromarray(mask.astype(np.uint8) * 255).convert("1") \
            .save(str(out), "png")
        n += 1
    return n


@click.command()
@click.argument("corpus", type=click.Path(exists=True), required=True)
@click.option("--window-size", type=int, default=15)
def binarize(corpus, window_size):
    """Generate the binarized corpus next to CORPUS."""
    n = gen_binarized(corpus, window_size)
    print("binarized %d images." % n)


if __name__ == "__main__":
    binarize()
