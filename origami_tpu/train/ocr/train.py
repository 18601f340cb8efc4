"""CTC line-recognizer training on a TPU mesh.

Replaces external Calamari training (reference README.md:366-375):
optax.ctc_loss over width-bucketed padded line batches, batch sharded
over the mesh "data" axis; params replicated (the recognizer is small —
DP is the right parallelism here).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from origami_tpu.models import recognizer as rec_lib
from origami_tpu.models import ctc as ctc_lib
from origami_tpu.parallel import mesh as mesh_lib


@dataclass
class OCRTrainConfig:
    num_symbols: int = 96
    height: int = 48
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    steps: int = 50_000
    warmup: int = 1000
    conv_features: tuple = (64, 128, 256)
    lstm_features: int = 256


class RecognizerTrainer:
    def __init__(self, cfg, mesh=None, seed=0):
        self.cfg = cfg
        self.mesh = mesh or mesh_lib.make_mesh()
        self.model = rec_lib.create_recognizer(
            cfg.num_symbols, conv_features=cfg.conv_features,
            lstm_features=cfg.lstm_features)
        params = rec_lib.init_recognizer(
            self.model, jax.random.PRNGKey(seed), height=cfg.height)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup,
            max(cfg.steps, cfg.warmup + 1))
        self.optimizer = optax.adamw(sched,
                                     weight_decay=cfg.weight_decay)
        with self.mesh:
            self.params = jax.device_put(
                params, mesh_lib.replicated(self.mesh))
            self.opt_state = self.optimizer.init(self.params)

        model = self.model
        optimizer = self.optimizer

        def step(params, opt_state, images, widths, labels, label_pad):
            def loss_fn(p):
                logits, pad = model.apply({"params": p}, images,
                                          widths=widths)
                return ctc_lib.ctc_loss(logits, pad, labels, label_pad)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))

    def train_step(self, images, widths, labels, label_pad):
        with self.mesh:
            batch = mesh_lib.shard_batch(
                self.mesh, (jnp.asarray(images), jnp.asarray(widths),
                            jnp.asarray(labels), jnp.asarray(label_pad)))
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, *batch)
        return float(loss)

    # -- device-resident-pool path -----------------------------------------
    def attach_pool(self, buckets):
        """buckets: {bucket_width: (strips_u8 (N, H, Wb), widths (N,),
        labels (N, L), label_pad (N, L))}. The whole pool moves to
        device memory once; train_on_bucket ships only indices per step
        (host-rendered float batches starve a remote device)."""
        import numpy as np
        model = self.model
        optimizer = self.optimizer

        with self.mesh:
            rep = mesh_lib.replicated(self.mesh)
            self._pool = {
                k: tuple(jax.device_put(np.asarray(a), rep) for a in v)
                for k, v in buckets.items()}

        def dstep(params, opt_state, strips_u8, widths, labels,
                  label_pad, idx):
            x = (1.0 - strips_u8[idx].astype(jnp.float32)
                 / 255.0)[..., None]

            def loss_fn(p):
                logits, pad = model.apply({"params": p}, x,
                                          widths=widths[idx])
                return ctc_lib.ctc_loss(logits, pad, labels[idx],
                                        label_pad[idx])
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._dstep = jax.jit(dstep, donate_argnums=(0, 1))

    def train_on_bucket(self, bucket, idx):
        """One step on pool rows `idx` of one width bucket; returns the
        loss as a device array (float() only when logging)."""
        with self.mesh:
            self.params, self.opt_state, loss = self._dstep(
                self.params, self.opt_state, *self._pool[bucket],
                jnp.asarray(idx, jnp.int32))
        return loss

    def save(self, path, charset):
        from origami_tpu.models import registry
        meta = dict(kind="recognizer", charset=charset,
                    height=self.cfg.height,
                    conv_features=list(self.cfg.conv_features),
                    lstm_features=self.cfg.lstm_features, version=1)
        registry.save_model(path, meta, self.params)


def encode_labels(texts, charset, max_len=None):
    """Map strings to padded CTC label arrays (blank=0, chars from 1)."""
    index = {c: i + 1 for i, c in enumerate(charset)}
    seqs = [[index[c] for c in t if c in index] for t in texts]
    L = max_len or max((len(s) for s in seqs), default=1)
    labels = np.zeros((len(seqs), L), np.int32)
    pad = np.ones((len(seqs), L), np.float32)
    for i, s in enumerate(seqs):
        s = s[:L]
        labels[i, : len(s)] = s
        pad[i, : len(s)] = 0.0
    return labels, pad
