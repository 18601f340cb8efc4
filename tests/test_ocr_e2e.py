"""End-to-end OCR learning test: train the recognizer on synthetic
glyph strips until it reads them, then run it through the OCR stage's
predictor path (greedy device decode + registry round trip)."""

import numpy as np
import pytest

CHARSET = "abcd"


def _glyph(sym, rng):
    """An 8x6 distinctive bitmap per symbol."""
    g = np.zeros((8, 6), np.float32)
    if sym == "a":
        g[1:7, 1:3] = 1            # left bar
    elif sym == "b":
        g[1:3, 1:5] = 1            # top bar
    elif sym == "c":
        g[5:7, 1:5] = 1            # bottom bar
    elif sym == "d":
        g[1:7, 1:5] = 1            # block
        g[3:5, 2:4] = 0
    return g


def _render(text, rng, height=16, width=64):
    img = np.zeros((height, width), np.float32)
    x = 3
    for ch in text:
        g = _glyph(ch, rng)
        y = 4
        img[y:y + 8, x:x + 6] = g
        x += 10
    img += rng.random((height, width)) * 0.1
    return np.clip(img, 0, 1)



def test_recognizer_learns_to_read(tmp_path):
    import jax
    from origami_tpu.parallel.mesh import make_mesh
    from origami_tpu.train.ocr.train import (
        RecognizerTrainer, OCRTrainConfig, encode_labels)
    from origami_tpu.models import registry, ctc

    rng = np.random.default_rng(0)
    cfg = OCRTrainConfig(num_symbols=len(CHARSET), height=16,
                         learning_rate=3e-3, steps=500, warmup=0,
                         conv_features=(16, 32, 48), lstm_features=48)
    tr = RecognizerTrainer(cfg, mesh=make_mesh(model_parallel=1))

    texts_pool = ["ab", "cd", "abc", "da", "bbc", "acd", "dab", "cc"]

    def batch(n=8):
        texts = [texts_pool[rng.integers(len(texts_pool))]
                 for _ in range(n)]
        imgs = np.stack([_render(t, rng)[..., None] for t in texts])
        widths = np.full((n,), imgs.shape[2], np.float32)
        labels, pad = encode_labels(texts, CHARSET, max_len=4)
        return imgs.astype(np.float32), widths, labels, pad, texts

    losses = []
    for step in range(400):
        imgs, widths, labels, pad, _ = batch()
        losses.append(tr.train_step(imgs, widths, labels, pad))
        if step > 150 and losses[-1] < 0.08:
            break   # reads well already
    assert losses[-1] < losses[0] * 0.5, losses[-5:]

    # save + reload through the registry, decode a fresh batch
    tr.save(tmp_path / "ocr_model", CHARSET)
    model, params, meta = registry.load_model(tmp_path / "ocr_model")
    imgs, widths, labels, pad, texts = batch(4)
    import jax.numpy as jnp
    logits, lpad = model.apply({"params": params}, jnp.asarray(imgs),
                               widths=jnp.asarray(widths))
    ids, lengths, conf = ctc.greedy_decode(logits, lpad)
    correct = 0
    for i, t in enumerate(texts):
        got = ctc.ids_to_text(np.asarray(ids[i]),
                              int(lengths[i]), CHARSET)
        if got == t:
            correct += 1
    assert correct >= 2, [(t, ctc.ids_to_text(
        np.asarray(ids[i]), int(lengths[i]), CHARSET))
        for i, t in enumerate(texts)]


def test_character_position_voting():
    """Calamari-style ConfidenceVoter semantics (reference ocr.py:33-67):
    members are edit-aligned onto the highest-confidence member and each
    position voted — a 3-member ensemble repairs member-specific
    single-char drops/substitutions/insertions even when no two members
    agree on the full sequence."""
    import types
    from origami_tpu.batch.detect.ocr import RecognizerPredictor as P

    self = types.SimpleNamespace(_align_ops=P._align_ops)
    vote = P._vote_texts
    assert vote(self, [("abc", 0.9), ("abc", 0.8)]) == ("abc", 0.9)
    # 2 members: disagreement is a 1-1 tie -> highest confidence
    assert vote(self, [("abc", 0.7), ("abd", 0.9)])[0] == "abd"
    # pivot dropped a char, 2 others have it -> repaired
    assert vote(self, [("Herstra", 0.95), ("Herrstra", 0.9),
                       ("Herrstra", 0.8)])[0] == "Herrstra"
    # pivot substitution out-voted
    assert vote(self, [("W0che", 0.95), ("Woche", 0.9),
                       ("Woche", 0.8)])[0] == "Woche"
    # member-specific errors, no two members equal -> pivot survives
    assert vote(self, [("Tunglich", 0.9), ("Tnglich", 0.85),
                       ("Tunglih", 0.8)])[0] == "Tunglich"
    # insertion carried by a strict majority
    assert vote(self, [("prei:", 0.95), ("preis:", 0.9),
                       ("preis:", 0.85)])[0] == "preis:"
