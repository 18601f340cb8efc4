"""Corpus -> trained models -> quality numbers, in one module.

The reference never shipped training (its nets come from the external
bbz-segment repo, reference README.md:223-229, and Calamari for OCR);
origami_tpu brings the whole loop in-house. This module is the
orchestration layer: given a GT corpus (real label masks, or the
synthetic newspaper corpus from train.synth) it

  * trains k-fold U-Net ensembles per network kind (region/separator)
    with median-frequency class weights and device warp augmentation,
  * evaluates per-class IoU against held-out GT masks through the SAME
    SegmentationPredictor the detect.segment stage serves,
  * distills each ensemble into one student (train.segment.distill) and
    measures the quality retained,
  * trains and evaluates the CTC recognizer (CER via the serving
    RecognizerPredictor path).

Voting semantics under test match origami/core/predict.py:327-368.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import numpy as np

REGION_CLASSES = ["TEXT", "TABULAR", "ILLUSTRATION", "BACKGROUND"]
SEP_CLASSES = ["H", "V", "T", "BACKGROUND"]
KIND_CLASSES = dict(region=REGION_CLASSES, separator=SEP_CLASSES)

log = logging.getLogger(__name__)


def load_corpus_arrays(corpus_dir, kind, full_size):
    """All (image, label) pages of one kind, resized to the net canvas.

    Returns (images (N, H, W) uint8, labels (N, H, W) uint8, names)."""
    import cv2
    import PIL.Image
    from origami_tpu.train.segment.data import page_pairs
    w, h = full_size
    imgs, labs, names = [], [], []
    for img_path, lab_path in page_pairs(corpus_dir, kind):
        img = np.asarray(PIL.Image.open(str(img_path)).convert("L"))
        lab = np.asarray(PIL.Image.open(str(lab_path)))
        imgs.append(cv2.resize(img, (w, h),
                               interpolation=cv2.INTER_AREA))
        labs.append(cv2.resize(lab, (w, h),
                               interpolation=cv2.INTER_NEAREST))
        names.append(img_path.stem)
    if not imgs:
        raise FileNotFoundError(
            "no (%s) page/label pairs under %s" % (kind, corpus_dir))
    return np.stack(imgs), np.stack(labs), names


def meta_for(kind, classes, full_size, width, s2d):
    return dict(kind="unet", type=kind, classes=classes,
                full_size=list(full_size), tile_size=list(full_size),
                tile_beta=50, width=width, s2d=s2d, channels=1,
                version=1)


def train_segmentation(corpus_dir, out_dir, kind, members=5, steps=600,
                       width=1.0, s2d=4, full_size=(1280, 2432),
                       batch=2, learning_rate=3e-4, seed=0,
                       warp_amplitude=10.0, log_every=50, mesh=None):
    """Train a k-member ensemble for one kind; returns final losses."""
    from origami_tpu.train.segment.data import class_weights, k_folds
    from origami_tpu.train.segment.train import (SegmentationTrainer,
                                                 TrainConfig)

    classes = KIND_CLASSES[kind]
    images, labels, names = load_corpus_arrays(corpus_dir, kind,
                                               full_size)
    cw = class_weights(list(labels), len(classes))
    folds = k_folds(names, k=members) if members > 1 else [[]]
    out_dir = Path(out_dir)
    w, h = full_size
    losses = []
    for m in range(members):
        excluded = set(folds[m % len(folds)]) if members > 1 else set()
        idx = [i for i, n in enumerate(names) if n not in excluded]
        if not idx:
            idx = list(range(len(names)))
        # hairline tolerance band for separators: background within
        # 2 px of a GT separator is don't-care (weighted 0.15) so a
        # 1-px-offset prediction isn't punished as both miss AND false
        # alarm — thin-structure IoU suffers from exactly that
        band = (classes.index("BACKGROUND"), 2, 0.15) \
            if kind == "separator" else None
        cfg = TrainConfig(
            num_classes=len(classes), width=width, s2d=s2d,
            tile_hw=(h, w), steps=steps,
            warmup=max(10, min(100, steps // 10)),
            learning_rate=learning_rate, class_weights=cw,
            band_dontcare=band)
        trainer = SegmentationTrainer(cfg, mesh=mesh, seed=seed + m)
        # the member's training rows live in device memory; each step
        # ships only indices (host-fed float batches measured 3.5 s/step
        # through the device tunnel vs compute-bound this way)
        trainer.attach_dataset(images[idx], labels[idx],
                               warp_amplitude=warp_amplitude,
                               seed=seed + m)
        rng = np.random.default_rng(seed + 1000 * m)
        t0 = time.time()
        loss = None
        for step in range(steps):
            sel = rng.integers(0, len(idx), size=batch)
            loss = trainer.train_on_indices(sel)
            if step % log_every == 0 or step == steps - 1:
                log.info("[%s %d/%d] step %d/%d loss %.4f (%.2f s/step)",
                         kind, m + 1, members, step, steps, float(loss),
                         (time.time() - t0) / (step + 1))
        trainer.save(out_dir / kind / ("%02d" % m),
                     meta_for(kind, classes, full_size, width, s2d))
        losses.append(float(loss))
    return losses


def eval_segmentation(models_path, val_dir, target="quality",
                      batch=4, mesh=None):
    """Per-kind, per-class IoU of the serving predictor vs GT masks.

    Aggregates intersections/unions over the whole validation set (not
    a mean of per-page IoUs, which over-weights near-empty classes)."""
    import cv2
    import PIL.Image
    from origami_tpu.core.predict import SegmentationPredictor
    from origami_tpu.train.segment.data import page_pairs

    predictor = SegmentationPredictor(models_path, target=target,
                                      mesh=mesh)
    report = {}
    for kind in ("region", "separator"):
        classes = KIND_CLASSES[kind]
        pairs = list(page_pairs(val_dir, kind))
        inter = np.zeros(len(classes), np.int64)
        union = np.zeros(len(classes), np.int64)
        for start in range(0, len(pairs), batch):
            chunk = pairs[start: start + batch]
            pages = [np.asarray(PIL.Image.open(str(ip)).convert("L"))
                     for ip, _ in chunk]
            segs = predictor.predict_batch(pages)
            for (ip, lp), seg in zip(chunk, segs):
                pred = seg.by_name(
                    "regions" if kind == "region" else "separators")
                lab = pred.labels
                gt = np.asarray(PIL.Image.open(str(lp)))
                gt = cv2.resize(gt, (lab.shape[1], lab.shape[0]),
                                interpolation=cv2.INTER_NEAREST)
                for c in range(len(classes)):
                    am = lab == c
                    bm = gt == c
                    inter[c] += np.logical_and(am, bm).sum()
                    union[c] += np.logical_or(am, bm).sum()
        report[kind] = {
            classes[c]: (float(inter[c] / union[c]) if union[c] else
                         None)
            for c in range(len(classes))}
        ious = [v for v in report[kind].values() if v is not None]
        report[kind]["_mean"] = float(np.mean(ious)) if ious else None
    return report


def eval_separator_tolerant(models_path, val_dir, target="quality",
                            tol=3, batch=4, mesh=None):
    """Functional separator quality: recall/precision at +-tol px.

    Hairline-mask IoU punishes sub-pixel drift that the downstream
    consumers (core/separate.py polyline extraction, layout column
    splitting) cannot even observe; this measures what they consume:
    a GT separator pixel counts as found if a predicted pixel of the
    same class lies within `tol` px (dilated-prediction recall), and
    vice versa for precision."""
    import cv2
    import PIL.Image
    from origami_tpu.core.predict import SegmentationPredictor
    from origami_tpu.train.segment.data import page_pairs

    predictor = SegmentationPredictor(models_path, target=target,
                                      mesh=mesh)
    classes = KIND_CLASSES["separator"]
    kernel = np.ones((2 * tol + 1, 2 * tol + 1), np.uint8)
    hit_r = np.zeros(len(classes), np.int64)
    tot_r = np.zeros(len(classes), np.int64)
    hit_p = np.zeros(len(classes), np.int64)
    tot_p = np.zeros(len(classes), np.int64)
    pairs = list(page_pairs(val_dir, "separator"))
    for start in range(0, len(pairs), batch):
        chunk = pairs[start: start + batch]
        pages = [np.asarray(PIL.Image.open(str(ip)).convert("L"))
                 for ip, _ in chunk]
        segs = predictor.predict_batch(pages)
        for (ip, lp), seg in zip(chunk, segs):
            lab = seg.by_name("separators").labels
            gt = np.asarray(PIL.Image.open(str(lp)))
            gt = cv2.resize(gt, (lab.shape[1], lab.shape[0]),
                            interpolation=cv2.INTER_NEAREST)
            for c, name in enumerate(classes):
                if name == "BACKGROUND":
                    continue
                pm = (lab == c).astype(np.uint8)
                gm = (gt == c).astype(np.uint8)
                pd = cv2.dilate(pm, kernel)
                gd = cv2.dilate(gm, kernel)
                hit_r[c] += int((gm & pd).sum())
                tot_r[c] += int(gm.sum())
                hit_p[c] += int((pm & gd).sum())
                tot_p[c] += int(pm.sum())
    report = {}
    f1s = []
    for c, name in enumerate(classes):
        if name == "BACKGROUND":
            continue
        r = float(hit_r[c] / tot_r[c]) if tot_r[c] else None
        p = float(hit_p[c] / tot_p[c]) if tot_p[c] else None
        f1 = (2 * r * p / (r + p)) if r and p else None
        report[name] = dict(recall=r, precision=p, f1=f1)
        if f1 is not None:
            f1s.append(f1)
    report["_mean_f1"] = float(np.mean(f1s)) if f1s else None
    report["tol_px"] = tol
    return report


def distill_students(models_path, corpus_dir, out_dir, steps=800,
                     batch=2, seed=0, mesh=None,
                     student_cfg=None, learning_rate=2e-4):
    """Fold each trained ensemble into ONE student per kind.

    student_cfg: {kind: dict(width=..., s2d=...)}; defaults to the
    teacher's own architecture (same capacity, 1/N inference cost)."""
    from origami_tpu.models import registry
    from origami_tpu.train.segment.distill import (DistillConfig,
                                                   Distiller)

    models_path = Path(models_path)
    out_dir = Path(out_dir)
    losses = {}
    for kind in ("region", "separator"):
        gdir = models_path / kind
        members = sorted(d for d in gdir.iterdir()
                         if (d / "meta.json").exists())
        model, stack, meta = registry.load_ensemble(members)
        full_w, full_h = meta["full_size"]
        sc = (student_cfg or {}).get(kind, {})
        cfg = DistillConfig(
            num_classes=len(meta["classes"]),
            width=sc.get("width", meta.get("width", 1.0)),
            s2d=sc.get("s2d", meta.get("s2d", 1)),
            tile_hw=(full_h, full_w), steps=steps,
            warmup=max(10, min(100, steps // 10)),
            learning_rate=learning_rate)
        distiller = Distiller(cfg, model, stack, mesh=mesh, seed=seed)
        images, labels, _ = load_corpus_arrays(
            corpus_dir, kind, (full_w, full_h))
        distiller.attach_dataset(images, labels, seed=seed)
        rng = np.random.default_rng(seed)
        loss = None
        t0 = time.time()
        for step in range(steps):
            sel = rng.integers(0, len(images), size=batch)
            loss = distiller.distill_on_indices(sel)
            if step % 50 == 0 or step == steps - 1:
                log.info("[distill %s] step %d/%d loss %.4f "
                         "(%.2f s/step)", kind, step, steps,
                         float(loss), (time.time() - t0) / (step + 1))
        loss = float(loss)
        smeta = meta_for(kind, meta["classes"],
                         (full_w, full_h), cfg.width, cfg.s2d)
        distiller.save(out_dir / kind / "00", smeta)
        losses[kind] = loss
    return losses


def train_recognizer_synth(out_dir, steps=2000, batch=64, height=48,
                           seed=0, mesh=None, learning_rate=1e-3,
                           conv_features=(64, 128, 256),
                           lstm_features=256, max_text_len=None,
                           n_pool=6000, log_every=50):
    """Train the CTC recognizer on synthetic line strips.

    Strips are pre-rendered into a pool once (host rendering per step
    would starve the device on a small host) and batches sample from
    it; one shared width bucket per batch keeps compiles bounded."""
    from origami_tpu.models.recognizer import width_buckets
    from origami_tpu.train.ocr.train import (OCRTrainConfig,
                                             RecognizerTrainer,
                                             encode_labels)
    from origami_tpu.train.synth import CHARSET, render_line

    cfg = OCRTrainConfig(
        num_symbols=len(CHARSET), height=height, steps=steps,
        warmup=max(20, min(200, steps // 10)),
        learning_rate=learning_rate, conv_features=conv_features,
        lstm_features=lstm_features)
    trainer = RecognizerTrainer(cfg, mesh=mesh, seed=seed)

    t0 = time.time()
    # half the pool straight from rendered DEGRADED pages with the
    # serving band framing (train.synth.page_line_pool) — the true
    # serving distribution; the renderer half adds text-length and
    # margin/softness diversity beyond what the page generator emits
    from origami_tpu.train.synth import page_line_pool
    page_pool = page_line_pool(
        n_pages=max(4, n_pool // 180), height=height,
        seed=7_000_000 + seed)
    rng_pool = np.random.default_rng(seed + 41)
    if len(page_pool) > n_pool // 2:
        sel = rng_pool.choice(len(page_pool), n_pool // 2, replace=False)
        page_pool = [page_pool[i] for i in sel]
    pool = page_pool + [
        render_line(seed * 100_000 + i, height=height)
        for i in range(n_pool - len(page_pool))]
    log.info("[ocr] pool of %d strips (%d page-extracted) rendered "
             "in %.1f s", len(pool), len(page_pool), time.time() - t0)

    # group the pool into width buckets and move it to device memory
    by_bucket = {}
    bks = width_buckets([s.shape[1] for s, _ in pool])
    for (s, t), b in zip(pool, bks):
        by_bucket.setdefault(b, []).append((s, t))
    buckets = {}
    for b, items in by_bucket.items():
        x = np.zeros((len(items), height, b), np.uint8)
        wds = np.zeros((len(items),), np.float32)
        for i, (s, _) in enumerate(items):
            sw = min(s.shape[1], b)
            # store white-padded raw strips; the step inverts on device
            x[i, :, :sw] = s[:, :sw]
            x[i, :, sw:] = 255
            wds[i] = sw
        # labels must NEVER be truncated against a strip that shows
        # the full text — CTC then learns to stop emitting early
        bucket_max = max(len(t) for _, t in items) + 1
        labels, pad = encode_labels(
            [t for _, t in items], CHARSET,
            max_len=min(max_text_len, bucket_max)
            if max_text_len else bucket_max)
        buckets[b] = (x, wds, labels, pad)
    trainer.attach_pool(buckets)
    keys = sorted(buckets)
    weights = np.array([len(by_bucket[k]) for k in keys], np.float64)
    weights /= weights.sum()

    rng = np.random.default_rng(seed)
    t0 = time.time()
    loss = None
    for step in range(steps):
        b = keys[rng.choice(len(keys), p=weights)]
        sel = rng.integers(0, len(by_bucket[b]), size=batch)
        loss = trainer.train_on_bucket(b, sel)
        if step % log_every == 0 or step == steps - 1:
            log.info("[ocr] step %d/%d loss %.4f (%.2f s/step)",
                     step, steps, float(loss),
                     (time.time() - t0) / (step + 1))
    trainer.save(Path(out_dir), CHARSET)
    return float(loss)


def eval_recognizer(model_dir, n=200, seed=123_456, height=None,
                    decoder="greedy", vote="sequence"):
    """Mean CER of the serving RecognizerPredictor on held-out synthetic
    lines (seed-disjoint from training by construction). ``model_dir``
    may be a list of model dirs — the multi-model voting mode
    (reference origami/batch/detect/ocr.py:33-67)."""
    from origami_tpu.batch.detect.ocr import RecognizerPredictor
    from origami_tpu.batch.utils.evaluate import cer
    from origami_tpu.train.synth import render_line

    dirs = ([Path(d) for d in model_dir]
            if isinstance(model_dir, (list, tuple)) else [Path(model_dir)])
    predictor = RecognizerPredictor(dirs, decoder=decoder, vote=vote)
    h = height or predictor.line_height
    strips, texts = [], []
    for i in range(n):
        s, t = render_line(seed + i, height=h)
        strips.append((("val", str(i)), s))
        texts.append(t)
    preds, confs = predictor.predict(strips)
    cers = [cer(t, p) for t, p in zip(texts, preds)]
    return dict(cer=float(np.mean(cers)),
                cer_median=float(np.median(cers)),
                n=n, conf=float(np.mean(confs)))
