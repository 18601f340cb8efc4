"""Mesh/sharding/training tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def test_make_mesh():
    from origami_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape["data"] == 4
    assert mesh.shape["model"] == 2


def test_multihost_assignment():
    from origami_tpu.parallel.multihost import my_pages, stable_shard
    paths = ["page%04d.png" % i for i in range(100)]
    shards = [my_pages(paths, index=i, count=4) for i in range(4)]
    # partition: disjoint and complete
    all_assigned = sorted(sum(shards, []))
    assert all_assigned == sorted(paths)
    assert all(len(s) > 10 for s in shards)
    # deterministic
    assert my_pages(paths, index=2, count=4) == shards[2]


def test_segmentation_trainer_step():
    from origami_tpu.parallel.mesh import make_mesh
    from origami_tpu.train.segment.train import (
        SegmentationTrainer, TrainConfig)
    mesh = make_mesh(model_parallel=2)
    cfg = TrainConfig(num_classes=4, width=0.25, tile_hw=(64, 64),
                      steps=10, warmup=0)
    tr = SegmentationTrainer(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    imgs = rng.random((4, 64, 64, 1)).astype(np.float32)
    labels = rng.integers(0, 4, (4, 64, 64)).astype(np.int32)
    losses = [tr.train_step(imgs, labels) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # same batch, loss must drop


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    # the production flagship graph: (region, separator) label maps
    reg, sep = jax.eval_shape(fn, *args)
    assert reg.shape[0] == 2 and sep.shape[0] == 2
    assert reg.shape[1:] == (2432, 1280)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_segmentation_inference(tmp_path):
    """Page batch sharded over the mesh data axis through the ensemble
    graph (shard_map) — multi-chip corpus streaming."""
    import numpy as np
    from origami_tpu.models import registry
    from origami_tpu.parallel.mesh import make_mesh
    from origami_tpu.core.predict import SegmentationPredictor

    for kind, group in (("region", "region"), ("separator", "separator")):
        meta = registry.default_segmentation_meta(
            kind, full_size=(64, 96), width=0.125, s2d=2)
        registry.init_and_save(tmp_path / group / "1", meta)

    mesh = make_mesh(model_parallel=1)   # 8-way data
    pred = SegmentationPredictor(tmp_path, target="speed", mesh=mesh)
    rng = np.random.default_rng(0)
    pages = [rng.integers(0, 255, (96, 64)).astype(np.uint8)
             for _ in range(5)]   # 5 pages -> padded to 8 shards
    segs = pred.predict_batch(pages)
    assert len(segs) == 5
    for seg in segs:
        assert {p.name for p in seg.predictions} \
            == {"regions", "separators"}
        # 96x64 pages pad to the 128x64 compile bucket; the canvas
        # output (96, 64) is cropped back to the page's content
        # fraction (96/128) so the raster maps 1:1 onto the page
        assert seg.by_name("regions").labels.shape == (72, 64)
