import numpy as np
import pytest

import jax
import jax.numpy as jnp

from origami_tpu.models import unet, recognizer, ctc, registry


def test_unet_shapes():
    model = unet.create_unet(4, width=0.125)
    params = unet.init_unet(model, jax.random.PRNGKey(0), (64, 96))
    x = jnp.zeros((2, 64, 96, 1))
    logits = model.apply({"params": params}, x)
    assert logits.shape == (2, 64, 96, 4)
    assert logits.dtype == jnp.float32


def test_unet_ensemble_vote():
    model = unet.create_unet(3, width=0.125)
    p1 = unet.init_unet(model, jax.random.PRNGKey(0), (32, 32))
    p2 = unet.init_unet(model, jax.random.PRNGKey(1), (32, 32))
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
    x = jnp.ones((1, 32, 32, 1)) * 0.5
    probs = unet.ensemble_apply(model, stacked, x)
    assert probs.shape == (1, 32, 32, 3)
    # summed softmaxes of 2 models sum to 2 per pixel
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 2.0, atol=1e-3)


def test_recognizer_shapes():
    model = recognizer.create_recognizer(
        20, conv_features=(16, 32, 48), lstm_features=48)
    params = recognizer.init_recognizer(model, jax.random.PRNGKey(0),
                                        height=48, width=128)
    x = jnp.zeros((2, 48, 128, 1))
    logits, pad = model.apply({"params": params}, x,
                              widths=jnp.asarray([128, 64]))
    assert logits.shape[0] == 2
    assert logits.shape[2] == 21  # +1 blank
    assert pad.shape == logits.shape[:2]
    # second sample has padding in the tail
    assert pad[1].sum() > 0 and pad[0].sum() == 0


def test_ctc_greedy_decode():
    # construct logits spelling "ab" with blanks: indices a=1, b=2
    T, K = 8, 4
    seq = [0, 1, 1, 0, 2, 0, 0, 0]
    logits = np.full((1, T, K), -10.0, np.float32)
    for t, s in enumerate(seq):
        logits[0, t, s] = 10.0
    ids, lengths, conf = ctc.greedy_decode(
        jnp.asarray(logits), jnp.zeros((1, T)))
    assert int(lengths[0]) == 2
    assert ids[0, 0] == 1 and ids[0, 1] == 2
    assert float(conf[0]) > 0.9
    assert ctc.ids_to_text(ids[0], lengths[0], "ab") == "ab"


def test_ctc_loss_decreases():
    import optax
    model = recognizer.create_recognizer(
        5, conv_features=(16, 32, 48), lstm_features=48)
    params = recognizer.init_recognizer(model, jax.random.PRNGKey(0),
                                        height=32, width=64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 64, 1))
    labels = jnp.asarray([[1, 2, 3, 0], [2, 2, 4, 0]])
    label_pad = jnp.asarray([[0., 0., 0., 1.], [0., 0., 0., 1.]])

    def loss_fn(p):
        logits, pad = model.apply({"params": p}, x)
        return ctc.ctc_loss(logits, pad, labels, label_pad)

    opt = optax.adam(1e-3)
    state = opt.init(params)
    l0 = float(loss_fn(params))
    p = params
    for _ in range(5):
        g = jax.grad(loss_fn)(p)
        updates, state = opt.update(g, state)
        p = optax.apply_updates(p, updates)
    l1 = float(loss_fn(p))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0


def test_beam_search_matches_greedy_simple():
    T, K = 6, 4
    seq = [0, 1, 0, 3, 3, 0]
    logits = np.full((T, K), -8.0, np.float32)
    for t, s in enumerate(seq):
        logits[t, s] = 8.0
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    text, score = ctc.beam_search_decode(logp, "abc", beam_width=4)
    assert text == "ac"


def test_registry_roundtrip(tmp_path):
    meta = registry.default_segmentation_meta(
        "region", full_size=(64, 96), tile_size=(64, 48), width=0.125,
        s2d=2)
    registry.init_and_save(tmp_path / "m1", meta)
    model, params, meta2 = registry.load_model(tmp_path / "m1")
    assert meta2["classes"] == ["TEXT", "TABULAR", "ILLUSTRATION", "BACKGROUND"]
    x = jnp.zeros((1, 48, 64, 1))
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 48, 64, 4)

    # ensemble of two
    registry.init_and_save(tmp_path / "m2", meta, seed=1)
    model, stacked, _ = registry.load_ensemble(
        [tmp_path / "m1", tmp_path / "m2"])
    probs = __import__("origami_tpu.models.unet", fromlist=["unet"]) \
        .ensemble_apply(model, stacked, x)
    assert probs.shape == (1, 48, 64, 4)


def test_registry_float16_storage(tmp_path):
    # checked-in pretrained models are stored f16 (half the repo bytes);
    # load_model must restore an f32 tree numerically ~equal to f32 save
    meta = registry.default_segmentation_meta(
        "region", full_size=(64, 96), tile_size=(64, 48), width=0.125,
        s2d=2)
    params = registry.init_and_save(tmp_path / "f32", meta)
    registry.save_model(tmp_path / "f16", meta, params,
                        params_dtype="float16")
    s32 = (tmp_path / "f32" / "params.msgpack").stat().st_size
    s16 = (tmp_path / "f16" / "params.msgpack").stat().st_size
    assert s16 < 0.6 * s32
    model, p16, meta2 = registry.load_model(tmp_path / "f16")
    assert meta2["params_dtype"] == "float16"
    flat32 = jax.tree_util.tree_leaves(params)
    flat16 = jax.tree_util.tree_leaves(p16)
    for a, b in zip(flat32, flat16):
        assert b.dtype == a.dtype
        assert jnp.max(jnp.abs(a - b)) < 2e-3
    x = jnp.zeros((1, 48, 64, 1))
    out = model.apply({"params": p16}, x)
    assert out.shape == (1, 48, 64, 4)


def test_width_buckets():
    b = recognizer.width_buckets([100, 300, 2000, 5000])
    assert b[0] >= 100 and b[1] >= 300 and b[3] == 2048
    assert all(x % 4 == 0 for x in b)


def test_recognizer_predictor_beam(tmp_path):
    """RecognizerPredictor end to end with the beam decoder."""
    from origami_tpu.models import registry
    from origami_tpu.batch.detect.ocr import RecognizerPredictor
    meta = dict(kind="recognizer", charset="abcd", height=16,
                conv_features=[16, 32, 48], lstm_features=48, version=1)
    registry.init_and_save(tmp_path / "m", meta)
    pred = RecognizerPredictor([tmp_path / "m"], decoder="beam",
                               beam_width=4)
    rng = np.random.default_rng(0)
    strips = [(("regions", "TEXT", "0", str(i)),
               (rng.random((16, 64)) * 255).astype(np.uint8))
              for i in range(3)]
    texts, confs = pred.predict(strips)
    assert len(texts) == 3
    assert all(isinstance(t, str) for t in texts)
    assert all(0 <= c <= 1.001 for c in confs)


def test_recognizer_lstm_dtype_serving_mode():
    """bfloat16 recurrent compute is a serving-time numeric mode: the
    param tree is dtype-independent (checkpoints interchangeable) and
    logits stay within bf16 rounding of the f32 path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from origami_tpu.models.recognizer import (create_recognizer,
                                               init_recognizer)
    m32 = create_recognizer(30, lstm_dtype=jnp.float32)
    mbf = create_recognizer(30, lstm_dtype=jnp.bfloat16)
    params = init_recognizer(m32, jax.random.PRNGKey(0))
    tree32 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), params)
    treebf = jax.tree.map(lambda a: (a.shape, str(a.dtype)),
                          init_recognizer(mbf, jax.random.PRNGKey(0)))
    assert tree32 == treebf
    x = jnp.asarray(np.random.default_rng(0).random((2, 48, 128, 1)),
                    jnp.float32)
    w = jnp.asarray([100.0, 128.0])
    l32, _ = m32.apply({"params": params}, x, w)
    lbf, _ = mbf.apply({"params": params}, x, w)
    assert l32.dtype == lbf.dtype == jnp.float32
    assert np.abs(np.asarray(l32) - np.asarray(lbf)).max() < 0.05
