"""Ensemble -> single-student distillation for segmentation nets.

The reference deploys 5-model softmax-sum ensembles per predictor for
quality (origami/core/segment.py:97-135) — 5x the inference cost. The
TPU-native path: train the ensemble (or k-fold members) once, then
distill into ONE student that detect.segment serves at full quality and
1/5 the FLOPs. Loss = KL(student || mean-teacher-softmax) at temperature
T, plus standard CE on hard labels where available.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from origami_tpu.models import unet as unet_lib
from origami_tpu.parallel import mesh as mesh_lib
from origami_tpu.parallel import sharding as sharding_lib


@dataclass
class DistillConfig:
    num_classes: int = 4
    width: float = 1.0
    s2d: int = 2
    tile_hw: tuple = (896, 1280)
    temperature: float = 2.0
    hard_weight: float = 0.3
    learning_rate: float = 2e-4
    steps: int = 10_000
    warmup: int = 200


class Distiller:
    """Teacher = stacked ensemble params (same arch family, any size);
    student = a fresh (usually smaller/faster) net."""

    def __init__(self, cfg, teacher_model, teacher_stack, mesh=None,
                 seed=0):
        self.cfg = cfg
        self._teacher_model = teacher_model
        self.mesh = mesh or mesh_lib.make_mesh()
        self.student = unet_lib.create_unet(
            cfg.num_classes, width=cfg.width, s2d=cfg.s2d)
        params = unet_lib.init_unet(
            self.student, jax.random.PRNGKey(seed), cfg.tile_hw)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup,
            max(cfg.steps, cfg.warmup + 1))
        self.optimizer = optax.adamw(sched)
        with self.mesh:
            self.params = sharding_lib.shard_params(self.mesh, params)
            self.opt_state = self.optimizer.init(self.params)
            self.teacher_stack = jax.device_put(
                teacher_stack, mesh_lib.replicated(self.mesh))

        student = self.student
        optimizer = self.optimizer
        T = cfg.temperature
        hard_w = cfg.hard_weight

        def step(params, opt_state, teacher_stack, images, labels,
                 label_mask):
            # teacher soft targets: mean of member softmaxes at temp T
            def teach(p):
                logits = teacher_model.apply({"params": p}, images)
                return jax.nn.softmax(logits / T, axis=-1)

            tprobs, _ = jax.lax.scan(
                lambda acc, p: (acc + teach(p), None),
                jnp.zeros(images.shape[:3] + (cfg.num_classes,),
                          jnp.float32),
                teacher_stack)
            n = jax.tree_util.tree_leaves(teacher_stack)[0].shape[0]
            tprobs = tprobs / n

            def loss_fn(p):
                slogits = student.apply({"params": p}, images)
                slogp = jax.nn.log_softmax(slogits / T, axis=-1)
                tlogp = jnp.log(jnp.maximum(tprobs, 1e-9))
                # true KL(teacher || student): floor at 0 when matched
                kl = jnp.mean(jnp.sum(
                    tprobs * (tlogp - slogp), axis=-1)) * T * T
                onehot = jax.nn.one_hot(labels, cfg.num_classes)
                ce_px = -jnp.sum(
                    onehot * jax.nn.log_softmax(slogits, axis=-1),
                    axis=-1)
                ce = jnp.sum(ce_px * label_mask) / jnp.maximum(
                    jnp.sum(label_mask), 1.0)
                return kl + hard_w * ce

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))

    # -- device-resident-corpus path ---------------------------------------
    def attach_dataset(self, images_u8, labels_u8, seed=0):
        """Upload the (N, H, W) uint8 corpus once; distill_on_indices
        transfers only indices per step (see train.py rationale)."""
        import numpy as np
        with self.mesh:
            rep = mesh_lib.replicated(self.mesh)
            self._data = (
                jax.device_put(np.asarray(images_u8, np.uint8), rep),
                jax.device_put(np.asarray(labels_u8, np.uint8), rep))

        teacher_model = self._teacher_model
        cfg = self.cfg
        student = self.student
        optimizer = self.optimizer
        T = cfg.temperature
        hard_w = cfg.hard_weight

        def dstep(params, opt_state, teacher_stack, data_img, data_lab,
                  idx):
            images = (data_img[idx].astype(jnp.float32) / 255.0)[..., None]
            labels = data_lab[idx].astype(jnp.int32)
            label_mask = jnp.ones(labels.shape, jnp.float32)

            def teach(p):
                logits = teacher_model.apply({"params": p}, images)
                return jax.nn.softmax(logits / T, axis=-1)

            tprobs, _ = jax.lax.scan(
                lambda acc, p: (acc + teach(p), None),
                jnp.zeros(images.shape[:3] + (cfg.num_classes,),
                          jnp.float32),
                teacher_stack)
            n = jax.tree_util.tree_leaves(teacher_stack)[0].shape[0]
            tprobs = tprobs / n

            def loss_fn(p):
                slogits = student.apply({"params": p}, images)
                slogp = jax.nn.log_softmax(slogits / T, axis=-1)
                tlogp = jnp.log(jnp.maximum(tprobs, 1e-9))
                kl = jnp.mean(jnp.sum(
                    tprobs * (tlogp - slogp), axis=-1)) * T * T
                onehot = jax.nn.one_hot(labels, cfg.num_classes)
                ce_px = -jnp.sum(
                    onehot * jax.nn.log_softmax(slogits, axis=-1),
                    axis=-1)
                ce = jnp.sum(ce_px * label_mask) / jnp.maximum(
                    jnp.sum(label_mask), 1.0)
                return kl + hard_w * ce

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._dstep = jax.jit(dstep, donate_argnums=(0, 1))

    def distill_on_indices(self, idx):
        """One distillation step on corpus rows `idx`; returns the loss
        as a device array (float() it only when logging)."""
        with self.mesh:
            self.params, self.opt_state, loss = self._dstep(
                self.params, self.opt_state, self.teacher_stack,
                *self._data, jnp.asarray(idx, jnp.int32))
        return loss

    def train_step(self, images, labels=None, label_mask=None):
        import numpy as np
        images = jnp.asarray(images)
        b, h, w = images.shape[:3]
        if labels is None:
            labels = jnp.zeros((b, h, w), jnp.int32)
            label_mask = jnp.zeros((b, h, w), jnp.float32)
        elif label_mask is None:
            label_mask = jnp.ones((b, h, w), jnp.float32)
        with self.mesh:
            images, labels, label_mask = mesh_lib.shard_batch(
                self.mesh, (images, jnp.asarray(labels),
                            jnp.asarray(label_mask)))
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, self.teacher_stack,
                images, labels, label_mask)
        return float(loss)

    def save(self, path, meta):
        from origami_tpu.models import registry
        registry.save_model(path, meta, self.params)
