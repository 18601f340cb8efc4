"""Adapt the distilled students to real scans via pseudo-labels.

The synthetic-corpus students under-segment real newsprint (fraktur
glyph shapes, halftone paper, low-resolution strokes — see
docs/real_scan_eval_r03.json). No real GT masks are obtainable in this
offline environment, but the heuristic segmenter (core.predict.
HeuristicSegmentationPredictor) is typeface-agnostic and works on the
real fixtures, so its masks serve as pseudo-labels: self-training in
the Noisy-Student sense, with the synth corpus as replay so the
students don't forget the exact-GT classes (TABULAR/ILLUSTRATION —
the heuristic can't label those).

Honesty note: fine-tuning on the very pages we evaluate is
transductive. For transfer evidence use --holdout PAGE, which drops
that page's pseudo-labels from training and reports the other page's
adaptation carrying over.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/finetune_real.py \
        --students work/bootstrap3/students --out work/finetune_real \
        --steps 300 --holdout none

Reference context: origami has no trainer (models arrive from an
external pipeline, origami/core/segment.py:16-40 just loads them);
domain adaptation here replaces "retrain offline on BBZ scans".
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import PIL.Image

sys.path.insert(0, str(Path(__file__).parent.parent))

DATA = Path(__file__).parent.parent / "tests" / "data"
REAL = [("p1872", "real_scan_1872.png"),
        ("p1925", "real_scan_bbz_1925.png")]


def build_corpus(out_dir, holdout, n_synth, seed):
    """Real pages + heuristic pseudo-label masks, plus synth replay.

    Returns the list of REAL page stems (for oversampling)."""
    from origami_tpu.core.predict import HeuristicSegmentationPredictor
    from origami_tpu.train.synth import render_page

    out_dir.mkdir(parents=True, exist_ok=True)
    pred = HeuristicSegmentationPredictor()
    real_stems = []
    for stem, fn in REAL:
        if stem == holdout:
            continue
        img = np.asarray(PIL.Image.open(DATA / fn).convert("L"))
        seg = pred(img)
        PIL.Image.fromarray(img).save(out_dir / (stem + ".png"))
        for p in seg.predictions:
            kind = {"REGION": "region",
                    "SEPARATOR": "separator"}[p.type.name]
            PIL.Image.fromarray(p.labels.astype(np.uint8)).save(
                out_dir / ("%s.labels.%s.png" % (stem, kind)))
        real_stems.append(stem)
    for i in range(n_synth):
        page = render_page(seed + i)
        stem = "synth%03d" % i
        PIL.Image.fromarray(page.image).save(out_dir / (stem + ".png"))
        PIL.Image.fromarray(page.region_labels).save(
            out_dir / (stem + ".labels.region.png"))
        PIL.Image.fromarray(page.separator_labels).save(
            out_dir / (stem + ".labels.separator.png"))
    return real_stems


def finetune_kind(students, corpus, out_dir, kind, real_stems, steps,
                  lr, batch, real_frac, warp_amplitude, seed):
    from origami_tpu.models import registry
    from origami_tpu.train.bootstrap import load_corpus_arrays, meta_for
    from origami_tpu.train.segment.data import class_weights
    from origami_tpu.train.segment.train import (SegmentationTrainer,
                                                 TrainConfig)

    _, params, meta = registry.load_model(Path(students) / kind / "00")
    classes = meta["classes"]
    full_size = tuple(meta["full_size"])
    w, h = full_size
    images, labels, names = load_corpus_arrays(corpus, kind, full_size)
    cw = class_weights(list(labels), len(classes))
    band = (classes.index("BACKGROUND"), 2, 0.15) \
        if kind == "separator" else None
    cfg = TrainConfig(
        num_classes=len(classes), width=meta.get("width", 1.0),
        s2d=meta.get("s2d", 1), tile_hw=(h, w), steps=steps,
        warmup=max(5, steps // 20), learning_rate=lr,
        class_weights=cw, band_dontcare=band)
    trainer = SegmentationTrainer(cfg, seed=seed)
    # warm start: the student's params replace the random init; the
    # optimizer state restarts (Adam moments are not checkpointed)
    import jax
    from origami_tpu.parallel import sharding as sharding_lib
    with trainer.mesh:
        trainer.params = sharding_lib.shard_params(trainer.mesh, params)
        trainer.opt_state = jax.tree.map(
            lambda x: x, trainer.optimizer.init(trainer.params))
    trainer.attach_dataset(images, labels,
                           warp_amplitude=warp_amplitude, seed=seed)
    real_idx = np.asarray([i for i, n in enumerate(names)
                           if n in real_stems])
    synth_idx = np.asarray([i for i, n in enumerate(names)
                            if n not in real_stems])
    rng = np.random.default_rng(seed)
    t0 = time.time()
    loss = None
    for step in range(steps):
        n_real = rng.binomial(batch, real_frac) if len(real_idx) else 0
        sel = np.concatenate([
            rng.choice(real_idx, size=n_real) if n_real else
            np.empty((0,), np.int64),
            rng.choice(synth_idx, size=batch - n_real)])
        loss = trainer.train_on_indices(sel)
        if step % 25 == 0 or step == steps - 1:
            print("[%s] step %d/%d loss %.4f (%.2f s/step)"
                  % (kind, step, steps, float(loss),
                     (time.time() - t0) / (step + 1)), flush=True)
    trainer.save(Path(out_dir) / kind / "00",
                 meta_for(kind, classes, full_size, cfg.width, cfg.s2d))
    return float(loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--students", default="work/bootstrap3/students")
    ap.add_argument("--out", default="work/finetune_real")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n-synth", type=int, default=12)
    ap.add_argument("--real-frac", type=float, default=0.5,
                    help="expected fraction of real rows per batch")
    ap.add_argument("--warp", type=float, default=8.0)
    ap.add_argument("--holdout", default="none",
                    choices=["none", "p1872", "p1925"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    out = Path(args.out)
    corpus = out / ("corpus_holdout_" + args.holdout)
    real_stems = build_corpus(corpus, args.holdout, args.n_synth,
                              seed=97_000_000 + args.seed)
    print("pseudo-labeled real pages:", real_stems, flush=True)
    losses = {}
    for kind in ("region", "separator"):
        losses[kind] = finetune_kind(
            args.students, corpus, out / "students", kind, real_stems,
            args.steps, args.lr, args.batch, args.real_frac, args.warp,
            args.seed)
    (out / "finetune_report.json").write_text(json.dumps(dict(
        holdout=args.holdout, steps=args.steps, lr=args.lr,
        real_pages=real_stems, losses=losses), indent=2))
    print(json.dumps(losses))


if __name__ == "__main__":
    main()
