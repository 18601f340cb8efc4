"""Training-data generation + trainer integration tests."""

import json
from pathlib import Path

import numpy as np
import PIL.Image
import pytest


@pytest.fixture()
def gt_corpus(tmp_path, rng):
    """Two pages with region label masks."""
    root = tmp_path / "gt"
    root.mkdir()
    for i in range(2):
        img = (rng.random((300, 200)) * 255).astype(np.uint8)
        lab = np.full((300, 200), 3, np.uint8)
        lab[40:140, 20:180] = 0   # TEXT
        lab[160:260, 20:180] = 1  # TABULAR
        PIL.Image.fromarray(img).save(root / ("p%d.png" % i))
        PIL.Image.fromarray(lab).save(
            root / ("p%d.labels.region.png" % i))
    return root


def test_tile_generation(gt_corpus, tmp_path):
    from origami_tpu.train.segment.data import (
        TileDataset, load_tile_batch, class_weights, k_folds)
    from origami_tpu.train.segment.labels import (
        LabelSet, DEFAULT_BBZ_SPEC)
    label_set = LabelSet(DEFAULT_BBZ_SPEC)
    ds = TileDataset(gt_corpus, label_set, "region",
                     full_size=(192, 288), tile_size=(192, 160),
                     beta0=16, augmentations=2)
    out = tmp_path / "tiles"
    names = ds.generate(out)
    assert len(names) == 2 * 2 * len(ds.layout)   # pages x variants
    assert (out / "weights.json").exists()
    assert (out / "codes.json").exists()
    codes = json.loads((out / "codes.json").read_text())
    assert codes["TEXT"] == 0 and codes["BACKGROUND"] == 3
    w = json.loads((out / "weights.json").read_text())["weights"]
    assert len(w) == 4 and all(x >= 0 for x in w)
    folds = json.loads((out / "folds.json").read_text())["folds"]
    assert sum(len(f) for f in folds) == 2
    images, labels = load_tile_batch(out, names[:3], (160, 192))
    assert images.shape == (3, 160, 192, 1)
    assert labels.max() <= 3


def test_warp_augmentation(rng):
    import jax
    from origami_tpu.train.segment.warp import WarpAugmentation
    img = (rng.random((128, 96)) * 255).astype(np.uint8)
    lab = np.zeros((128, 96), np.uint8)
    lab[30:90, 20:70] = 1
    aug = WarpAugmentation(amplitude=6.0, seed=1)
    im2, lab2 = aug(img, lab)
    assert im2.shape == img.shape and lab2.shape == lab.shape
    assert set(np.unique(lab2)) <= {0, 1}
    # deformation moved some labels but preserved rough mass
    assert lab2.sum() == pytest.approx(lab.sum(), rel=0.2)
    assert (lab2 != lab).sum() > 0


def test_label_set():
    from origami_tpu.train.segment.labels import (
        LabelSet, DEFAULT_BBZ_SPEC)
    ls = LabelSet(DEFAULT_BBZ_SPEC)
    assert set(ls.kinds) == {"region", "separator"}
    assert ls.label("separator", "V").orientation == "V"
    assert ls.background("region").index == 3
    assert ls.num_classes("region") == 4


def test_recognizer_trainer_learns():
    import jax
    from origami_tpu.parallel.mesh import make_mesh
    from origami_tpu.train.ocr.train import (
        RecognizerTrainer, OCRTrainConfig, encode_labels)
    cfg = OCRTrainConfig(num_symbols=5, height=32, steps=20, warmup=0,
                         learning_rate=3e-3,
                         conv_features=(16, 32, 48), lstm_features=48)
    tr = RecognizerTrainer(cfg, mesh=make_mesh(model_parallel=1))
    rng = np.random.default_rng(0)
    x = rng.random((4, 32, 64, 1)).astype(np.float32)
    widths = np.full((4,), 64, np.float32)
    labels, pad = encode_labels(["ab", "ba", "ab", "aa"], "abcde")
    losses = [tr.train_step(x, widths, labels, pad) for _ in range(5)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_distillation_step():
    import jax
    import jax.numpy as jnp
    from origami_tpu.models import unet as unet_lib
    from origami_tpu.parallel.mesh import make_mesh
    from origami_tpu.train.segment.distill import Distiller, DistillConfig

    teacher = unet_lib.create_unet(4, width=0.25)
    t1 = unet_lib.init_unet(teacher, jax.random.PRNGKey(0), (32, 32))
    t2 = unet_lib.init_unet(teacher, jax.random.PRNGKey(1), (32, 32))
    stack = jax.tree.map(lambda a, b: jnp.stack([a, b]), t1, t2)

    cfg = DistillConfig(num_classes=4, width=0.25, s2d=1,
                        tile_hw=(32, 32), steps=50, warmup=0,
                        learning_rate=1e-2)
    d = Distiller(cfg, teacher, stack, mesh=make_mesh(model_parallel=1))
    rng = np.random.default_rng(0)
    imgs = rng.random((2, 32, 32, 1)).astype(np.float32)
    losses = [d.train_step(imgs) for _ in range(8)]
    assert all(np.isfinite(l) for l in losses)
    # adamw has a small transient; the tail must descend below the start
    assert losses[-1] < losses[0]


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax
    from origami_tpu.train import checkpoint as ckpt

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    ckpt.save_state(tmp_path / "ck", 7, params, opt_state)
    assert ckpt.latest_step(tmp_path / "ck") == 7
    restored = ckpt.restore_state(tmp_path / "ck", params, opt_state)
    assert restored is not None
    step, p2, o2 = restored
    assert step == 7
    np.testing.assert_allclose(np.asarray(p2["w"]), 1.0)


def test_gt_segments_cleanup():
    from origami_tpu.train.segment.segments import clean_separators
    from origami_tpu.core.math import Orientation
    mask = np.zeros((60, 300), np.uint8)
    # one separator drawn as two fragments with a 10px gap
    mask[30:33, 10:140] = 1
    mask[30:33, 150:290] = 1
    # a speck
    mask[10:12, 50:60] = 1
    segs = clean_separators(mask, Orientation.H, max_gap=20,
                            min_length=25)
    assert len(segs) == 1
    c = segs[0].np_coords
    assert c[:, 0].min() < 20 and c[:, 0].max() > 280


def test_page_annotations(tmp_path, rng):
    from origami_tpu.train.segment.annotations import (
        load_page_annotations)
    img = (rng.random((50, 40)) * 255).astype(np.uint8)
    lab = np.full((50, 40), 3, np.uint8)
    lab[10:30, 5:35] = 0
    PIL.Image.fromarray(img).save(tmp_path / "p.png")
    PIL.Image.fromarray(lab).save(tmp_path / "p.labels.region.png")
    ann = load_page_annotations(tmp_path / "p.png")
    assert ann.kinds == ["region"]
    assert (ann.labels("region") == 0).sum() == 20 * 30
    with pytest.raises(FileNotFoundError):
        PIL.Image.fromarray(img).save(tmp_path / "q.png")
        load_page_annotations(tmp_path / "q.png")


def test_merge_obstacle_veto():
    # two collinear separator fragments; an obstacle between them must
    # veto the join (reference SegmentJoiner behavior)
    import numpy as np
    from origami_tpu.core.polyline import Polyline
    from origami_tpu.train.segment.segments import merge_by_distance
    a = Polyline([(0, 50), (40, 50)], width=2)
    b = Polyline([(55, 50), (95, 50)], width=2)
    free = merge_by_distance([a, b], max_gap=20)
    assert len(free) == 1
    obstacles = np.zeros((100, 100), bool)
    obstacles[45:55, 46:50] = True   # ink in the gap
    blocked = merge_by_distance([a, b], max_gap=20, obstacles=obstacles)
    assert len(blocked) == 2


def test_filter_by_quality():
    from origami_tpu.core.polyline import Polyline
    from origami_tpu.train.segment.segments import (filter_by_quality,
                                                    run_merge_pipeline)
    good = Polyline([(0, 0), (200, 0)], width=2, error=0.1)
    bad = Polyline([(0, 10), (200, 14)], width=2, error=1.4)
    short = Polyline([(0, 20), (4, 20)], width=2, error=0.0)
    kept = filter_by_quality([good, bad, short], max_error=0.5,
                             min_length=0.02, shape=(500, 400))
    assert kept == [good]
    # config-driven pipeline applies the same strategy
    kept2 = run_merge_pipeline(
        [good, bad, short],
        [dict(strategy="by_quality",
              args=dict(max_error=0.5, min_length=0.02))],
        shape=(500, 400))
    assert kept2 == [good]


def test_extract_segments_fit_error():
    import numpy as np
    from origami_tpu.core.math import Orientation
    from origami_tpu.train.segment.segments import extract_segments
    mask = np.zeros((60, 200), np.uint8)
    mask[30:32, 10:190] = 1            # clean straight separator
    segs = extract_segments(mask, Orientation.H)
    assert len(segs) == 1
    assert segs[0].error < 0.6
    blob = np.zeros((60, 200), np.uint8)  # fat blob: bad line fit
    blob[10:50, 40:160] = 1
    segs2 = extract_segments(blob, Orientation.H)
    assert len(segs2) == 1
    assert segs2[0].error > segs[0].error


def test_region_stoppers():
    import numpy as np
    from origami_tpu.core.polyline import Polyline
    from origami_tpu.train.segment.labels import (LabelSet,
                                                  DEFAULT_BBZ_SPEC)
    from origami_tpu.train.segment.regions import (AnnotationsGenerator,
                                                   generate_regions)
    label_set = LabelSet(DEFAULT_BBZ_SPEC)
    h, w = 200, 300
    labels = np.full((h, w), 3, np.uint8)
    # text ink: two columns separated by a whitespace gutter at x=150,
    # with a SHORT vertical separator that only spans the middle
    text = np.zeros((h, w), np.uint8)
    text[20:180, 20:140] = 1
    text[20:180, 160:280] = 1
    sep = Polyline([(150, 60), (150, 140)], width=3)
    gen = AnnotationsGenerator(
        label_set, labels, {"V": [sep]},
        segment_thickness=1.0, segment_extend={"V": 80})
    master = gen.master
    stops = gen.stops
    vidx = label_set.label("separator", "V").index
    # stops extends the stroke well beyond its master extent
    assert (stops == vidx).sum() > (master == vidx).sum() * 1.5
    # region growth: with a wide close kernel the two columns would
    # merge; the extended stopper keeps them apart
    merged = generate_regions(text, np.zeros_like(master),
                              close=(41, 11))
    assert merged.max() == 1
    split = generate_regions(text, stops == vidx, close=(41, 11))
    assert split.max() == 2


def test_deskewing_regions():
    import math
    import numpy as np
    from origami_tpu.core.polyline import Polyline
    from origami_tpu.train.segment.labels import (LabelSet,
                                                  DEFAULT_BBZ_SPEC)
    from origami_tpu.train.segment.regions import (AnnotationsGenerator,
                                                   estimate_skew)
    label_set = LabelSet(DEFAULT_BBZ_SPEC)
    angle = 0.03
    segs = {"H": [Polyline([(10, 50 + i * 30),
                            (290, 50 + i * 30 + 280 * math.tan(angle))],
                           width=2) for i in range(4)]}
    est = estimate_skew(segs)
    assert abs(est - angle) < 0.01
    labels = np.full((200, 300), 3, np.uint8)
    gen = AnnotationsGenerator(label_set, labels, segs)
    hidx = label_set.label("separator", "H").index
    master = gen.master
    # painted separators are level after deskewing: each stroke's
    # bounding-box height collapses to ~thickness (the skewed stroke
    # would span 280 * tan(0.03) + 2 ~ 10 px)
    import cv2
    n, _, stats, _ = cv2.connectedComponentsWithStats(
        (master == hidx).astype(np.uint8), 8)
    heights = [stats[i, 3] for i in range(1, n) if stats[i, 4] > 50]
    assert heights and max(heights) <= 6


def test_band_dontcare_loss():
    """Background within the tolerance band of a GT hairline is
    down-weighted: a prediction offset by 1 px must cost (much) less
    than one offset beyond the band; GT-exact stays cheapest."""
    import jax.numpy as jnp
    from origami_tpu.train.segment.train import weighted_ce_loss

    H = W = 16
    labels = np.full((1, H, W), 3, np.int64)    # BACKGROUND=3
    labels[0, :, 8] = 1                         # a vertical hairline (V)
    cw = jnp.ones((4,), jnp.float32)

    def logits_for(col):
        lg = np.zeros((1, H, W, 4), np.float32)
        lg[..., 3] = 4.0                        # confident background
        lg[0, :, col, 3] = 0.0
        lg[0, :, col, 1] = 4.0                  # hairline predicted at col
        return jnp.asarray(lg)

    band = (3, 2, 0.1)
    l_exact = float(weighted_ce_loss(logits_for(8), labels, cw, band))
    l_near = float(weighted_ce_loss(logits_for(9), labels, cw, band))
    l_far = float(weighted_ce_loss(logits_for(13), labels, cw, band))
    assert l_exact < l_near < l_far
    # without the band, near and far offsets cost the same
    l_near0 = float(weighted_ce_loss(logits_for(9), labels, cw))
    l_far0 = float(weighted_ce_loss(logits_for(13), labels, cw))
    assert abs(l_near0 - l_far0) < 1e-5
