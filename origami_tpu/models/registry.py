"""Model asset registry: on-disk model directories.

Mirrors the reference's model contract (a directory per model holding
meta.json + weights; origami/core/predict.py:171-228 reads meta.json keys
"classes", "type", "full_size", "tile_size", "tile_beta", "backbone") with
native Flax weights instead of Keras .h5:

    <models_path>/<model_name>/
        meta.json        {"kind": "unet"|"recognizer", "type": "region"|
                          "separator", "classes": [...], "full_size": [W,H],
                          "tile_size": [w,h], "tile_beta": 50, "width": 1.0,
                          "charset": "...", "height": 48, ...}
        params.msgpack   flax.serialization bytes of the parameter pytree

Ensembles are groups of sibling model dirs with identical meta; their
params are stacked into a leading axis for the vmapped ensemble apply.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from .unet import create_unet, init_unet
from .recognizer import create_recognizer, init_recognizer


# Architecture generation tag for recognizer checkpoints. The round-2
# MaskedGroupNorm + seq_lengths-BiLSTM change kept param names/shapes
# identical to the original architecture, so old checkpoints would load
# without error but decode differently — the tag makes them fail loudly
# instead (ADVICE r2).
RECOGNIZER_ARCH = "masked-gn+seq-lstm/2"


def save_model(path, meta, params, params_dtype=None):
    """Write a model directory. `params_dtype="float16"` stores weights
    half-size (for checked-in pretrained models); load_model restores
    compute dtype. f16 round-trip of trained f32 weights is lossless in
    effect: measured IoU/CER deltas are zero at report precision."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    if meta.get("kind") == "recognizer":
        meta = dict(meta, arch=meta.get("arch", RECOGNIZER_ARCH))
    params = jax.device_get(params)
    if params_dtype is not None:
        dt = np.dtype(params_dtype)
        meta = dict(meta, params_dtype=dt.name)
        params = jax.tree.map(
            lambda x: x.astype(dt)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            params)
    else:
        meta = {k: v for k, v in meta.items() if k != "params_dtype"}
    with open(path / "meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    with open(path / "params.msgpack", "wb") as f:
        f.write(serialization.to_bytes(params))


def load_meta(path):
    with open(Path(path) / "meta.json", "r") as f:
        return json.load(f)


def _build(meta):
    if meta["kind"] == "unet":
        return create_unet(len(meta["classes"]),
                           width=meta.get("width", 1.0),
                           s2d=meta.get("s2d", 1),
                           features=meta.get("features"),
                           bottleneck=meta.get("bottleneck"))
    if meta["kind"] == "recognizer":
        import os
        # serving-time recurrent compute dtype: env override wins,
        # then checkpoint meta, then f32. Param trees are identical
        # across dtypes — this never invalidates a checkpoint.
        ld = os.environ.get("ORIGAMI_TPU_LSTM_DTYPE",
                            meta.get("lstm_dtype", "float32"))
        return create_recognizer(
            len(meta["charset"]),
            conv_features=tuple(meta.get("conv_features",
                                         (64, 128, 256))),
            lstm_features=meta.get("lstm_features", 256),
            lstm_dtype=jnp.dtype(ld))
    raise ValueError("unknown model kind %r" % meta.get("kind"))


def _init_params(meta, seed=0):
    rng = jax.random.PRNGKey(seed)
    model = _build(meta)
    if meta["kind"] == "unet":
        th, tw = meta["tile_size"][1], meta["tile_size"][0]
        return init_unet(model, rng, (th, tw),
                         in_channels=meta.get("channels", 1))
    return init_recognizer(model, rng, height=meta.get("height", 48))


def load_model(path):
    """Returns (module, params, meta)."""
    path = Path(path)
    meta = load_meta(path)
    if meta.get("kind") == "recognizer":
        arch = meta.get("arch")
        if arch != RECOGNIZER_ARCH:
            raise ValueError(
                "recognizer checkpoint %s was saved for architecture "
                "%r but this build is %r (masked GroupNorm stats + "
                "seq_lengths LSTM sweeps change logits for identical "
                "params) — retrain, or stamp meta.json \"arch\" if the "
                "checkpoint is known to be post-change" %
                (path, arch, RECOGNIZER_ARCH))
    model = _build(meta)
    template = _init_params(meta)
    stored = meta.get("params_dtype")
    if stored is not None:
        dt = np.dtype(stored)
        template = jax.tree.map(
            lambda x: x.astype(dt)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            template)
    with open(path / "params.msgpack", "rb") as f:
        params = serialization.from_bytes(template, f.read())
    if stored is not None:
        params = jax.tree.map(
            lambda x: x.astype(np.float32)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
            params)
    return model, params, meta


def load_ensemble(paths):
    """Load N same-architecture models and stack their params along a new
    leading axis (for `unet.ensemble_apply`). Returns (module, stacked,
    meta)."""
    models = [load_model(p) for p in paths]
    metas = [m[2] for m in models]
    for m in metas[1:]:
        if m["classes"] != metas[0]["classes"] or m["kind"] != metas[0]["kind"]:
            raise ValueError("ensemble members disagree on architecture")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[m[1] for m in models])
    return models[0][0], stacked, metas[0]


def init_and_save(path, meta, seed=0):
    """Create a freshly initialized model on disk (used by tests, FAKE
    pipelines, and as the starting point for training)."""
    params = _init_params(meta, seed)
    save_model(path, meta, params)
    return params


def default_segmentation_meta(kind="region", full_size=(1280, 2432),
                              tile_size=None, width=None, s2d=None):
    """The BBZ-compatible class contracts (reference
    origami/core/segment.py:97-135: 'regions' and 'separators' nets).

    Defaults are the TPU-native design: space-to-depth stem, single-shot
    full-page inference (tile_size None), per-net geometry chosen from
    v5e measurements (docs/performance.md): region nets run s2d=4 with
    128-multiple channels (fastest at highest capacity — regions don't
    need fine boundaries), separator nets s2d=2 (thin strokes need the
    finer logit resolution). The reference's tiled geometry remains
    supported via explicit tile_size — tiling on TPU only matters for
    training memory, not inference."""
    if kind == "region":
        classes = ["TEXT", "TABULAR", "ILLUSTRATION", "BACKGROUND"]
        t = "region"
        s2d = 4 if s2d is None else s2d
        width = 2.0 if width is None else width
    else:
        classes = ["H", "V", "T", "BACKGROUND"]
        t = "separator"
        s2d = 2 if s2d is None else s2d
        width = 1.0 if width is None else width
    meta = dict(
        kind="unet", type=t, classes=classes, background="BACKGROUND",
        full_size=list(full_size), tile_beta=50, width=width,
        channels=1, s2d=s2d, version=1)
    meta["tile_size"] = list(tile_size) if tile_size else list(full_size)
    return meta
