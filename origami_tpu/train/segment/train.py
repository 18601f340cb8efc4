"""U-Net segmentation training on a TPU mesh.

The reference trains its nets in the external bbz-segment repo
(reference README.md:223-229); this module brings training in-house:
class-weighted softmax cross-entropy over (tile, label) batches, AdamW +
cosine schedule, rematerialized forward, batch sharded over the mesh
"data" axis and parameters tensor-sharded over "model" — XLA GSPMD
inserts the gradient reduce-scatters/all-reduces.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from origami_tpu.models import unet as unet_lib
from origami_tpu.parallel import mesh as mesh_lib
from origami_tpu.parallel import sharding as sharding_lib


@dataclass
class TrainConfig:
    num_classes: int = 4
    width: float = 1.0
    s2d: int = 1
    tile_hw: tuple = (896, 1280)
    learning_rate: float = 3e-4
    weight_decay: float = 1e-4
    steps: int = 10_000
    warmup: int = 500
    remat: bool = True
    class_weights: Any = None   # (num_classes,) loss weights, or None


def make_optimizer(cfg):
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, cfg.warmup, max(cfg.steps, cfg.warmup + 1))
    return optax.adamw(sched, weight_decay=cfg.weight_decay)


def weighted_ce_loss(logits, labels, class_weights):
    """Mean class-weighted cross entropy. labels (B, H, W) int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1])
    per_px = -jnp.sum(onehot * logp, axis=-1)
    w = class_weights[labels]
    return jnp.sum(per_px * w) / jnp.maximum(jnp.sum(w), 1e-6)


def make_train_step(model, optimizer, class_weights, remat=True):
    apply = model.apply
    if remat:
        apply = jax.checkpoint(apply)

    def step(params, opt_state, images, labels):
        def loss_fn(p):
            logits = apply({"params": p}, images)
            return weighted_ce_loss(logits, labels, class_weights)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


class SegmentationTrainer:
    """Owns params/opt_state placed on a mesh and the jitted step."""

    def __init__(self, cfg, mesh=None, seed=0):
        self.cfg = cfg
        self.mesh = mesh or mesh_lib.make_mesh()
        self.model = unet_lib.create_unet(cfg.num_classes,
                                          width=cfg.width, s2d=cfg.s2d)
        params = unet_lib.init_unet(
            self.model, jax.random.PRNGKey(seed), cfg.tile_hw)
        self.optimizer = make_optimizer(cfg)

        with self.mesh:
            self.params = sharding_lib.shard_params(self.mesh, params)
            self.opt_state = jax.tree.map(
                lambda x: x, self.optimizer.init(self.params))

        if cfg.class_weights is not None:
            class_weights = jnp.asarray(cfg.class_weights, jnp.float32)
        else:
            class_weights = jnp.ones((cfg.num_classes,), jnp.float32)
        step = make_train_step(self.model, self.optimizer, class_weights,
                               remat=cfg.remat)
        # shardings are carried by the arguments themselves (params were
        # device_put with the tensor-parallel rules, batches with the
        # data sharding); jit + GSPMD propagates and inserts collectives
        self._step = jax.jit(step, donate_argnums=(0, 1))

    def train_step(self, images, labels):
        """images (B, H, W, 1) float32, labels (B, H, W) int32."""
        with self.mesh:
            images = mesh_lib.shard_batch(self.mesh, jnp.asarray(images))
            labels = mesh_lib.shard_batch(self.mesh, jnp.asarray(labels))
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, images, labels)
        return float(loss)

    def save(self, path, meta):
        from origami_tpu.models import registry
        registry.save_model(path, meta, self.params)
