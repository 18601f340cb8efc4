"""CTC loss and decoding for the line recognizer.

The reference delegates OCR to Calamari's TF CTC stack
(origami/batch/detect/ocr.py:16-67); here CTC is native: optax.ctc_loss for
training, a jit-compiled greedy decoder on device for throughput, and a
host prefix beam search for quality/voting.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax

BLANK = 0  # blank index; charset indices start at 1


def ctc_loss(logits, logit_paddings, labels, label_paddings):
    """Mean CTC loss. logits (B, T, K) with blank at index 0."""
    per = optax.ctc_loss(logits, logit_paddings, labels, label_paddings,
                         blank_id=BLANK)
    return jnp.mean(per)


@jax.jit
def greedy_decode(logits, logit_paddings):
    """Best-path decode: argmax per frame, collapse repeats, drop blanks.

    Returns (ids (B, T) padded with 0, lengths (B,), confidence (B,)).
    Confidence is the mean max-softmax over non-padding frames.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    best = jnp.argmax(probs, axis=-1)                      # (B, T)
    pmax = jnp.max(probs, axis=-1)
    valid = logit_paddings < 0.5
    conf = jnp.sum(pmax * valid, axis=-1) / jnp.maximum(
        jnp.sum(valid, axis=-1), 1)

    prev = jnp.pad(best[:, :-1], ((0, 0), (1, 0)), constant_values=BLANK)
    keep = (best != BLANK) & (best != prev) & valid

    def compact(row_ids, row_keep):
        # stable-sort trick: order kept symbols first without dynamic shapes
        t = jnp.arange(row_ids.shape[0])
        key = jnp.where(row_keep, t, t + row_ids.shape[0])
        order = jnp.argsort(key)
        out = jnp.where(jnp.sort(key) < row_ids.shape[0],
                        row_ids[order], 0)
        return out

    ids = jax.vmap(compact)(best, keep)
    lengths = jnp.sum(keep, axis=-1)
    return ids, lengths, conf


def ids_to_text(ids, length, charset):
    """Map decoded ids (blank=0, chars start at 1) to a string."""
    out = []
    for i in np.asarray(ids)[: int(length)]:
        i = int(i)
        if 1 <= i <= len(charset):
            out.append(charset[i - 1])
    return "".join(out)


def beam_search_decode(log_probs, charset, beam_width=10):
    """Host prefix beam search over (T, K) log-probabilities.

    Returns (text, score). Used when multi-model voting needs summed
    per-frame distributions (the reference's Calamari voting equivalent).
    """
    T, K = log_probs.shape
    # beams: dict prefix(tuple) -> (p_blank, p_nonblank) in log space
    NEG = -1e30

    def logsum(a, b):
        if a <= NEG:
            return b
        if b <= NEG:
            return a
        m = max(a, b)
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    beams = {(): (0.0, NEG)}
    for t in range(T):
        lp = log_probs[t]
        top = np.argsort(lp)[-max(beam_width * 2, 8):]
        nxt = {}
        for prefix, (pb, pnb) in beams.items():
            total = logsum(pb, pnb)
            for k in top:
                p = float(lp[k])
                if k == BLANK:
                    cpb, cpnb = nxt.get(prefix, (NEG, NEG))
                    nxt[prefix] = (logsum(cpb, total + p), cpnb)
                else:
                    newfix = prefix + (int(k),)
                    if prefix and prefix[-1] == k:
                        # repeat char: extend only from blank path
                        cpb, cpnb = nxt.get(newfix, (NEG, NEG))
                        nxt[newfix] = (cpb, logsum(cpnb, pb + p))
                        cpb2, cpnb2 = nxt.get(prefix, (NEG, NEG))
                        nxt[prefix] = (cpb2, logsum(cpnb2, pnb + p))
                    else:
                        cpb, cpnb = nxt.get(newfix, (NEG, NEG))
                        nxt[newfix] = (cpb, logsum(cpnb, total + p))
        beams = dict(sorted(nxt.items(),
                            key=lambda kv: -logsum(*kv[1]))[:beam_width])
    best_prefix, (pb, pnb) = max(beams.items(), key=lambda kv: logsum(*kv[1]))
    text = "".join(charset[i - 1] for i in best_prefix
                   if 1 <= i <= len(charset))
    return text, logsum(pb, pnb)
