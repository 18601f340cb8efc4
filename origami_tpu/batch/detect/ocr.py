"""detect.ocr — batched line text recognition (CLI stage 8).

Reference contract: origami/batch/detect/ocr.py (image + lines.3 +
tables -> ocr.zip, one .txt per line path; FAKE and DRY modes built in).
The Calamari TF stack is replaced by the native CNN+BiLSTM+CTC recognizer
(origami_tpu.models.recognizer): line strips are extracted in one device
gather, width-bucketed so each bucket shape compiles once, and decoded
greedily on device; multi-model voting sums per-frame distributions and
beam-decodes on host.
"""

from __future__ import annotations

import logging
from pathlib import Path

import click
import numpy as np

from origami_tpu.batch.core.processor import BatchedProcessor, Processor
from origami_tpu.batch.core.io import Artifact, Input, Output, Stage
from origami_tpu.batch.core.lines import LineExtractor
from origami_tpu.batch.core.prof import span
from origami_tpu.batch.core.utils import RegionsFilter


def pack_strip(strip, bucket, line_height, name=""):
    """Normalize one uint8 line strip into (float inverted image, width)
    for the (line_height, bucket) recognizer input. Strips wider than
    the largest width bucket are squeezed horizontally instead of
    cropped, so the tail of full-width newspaper / table lines survives
    (the reference's Calamari path handles arbitrary widths)."""
    if strip.shape[1] > bucket:
        import cv2
        logging.warning(
            "line %s wider than max bucket (%d > %d px): downscaling",
            name, strip.shape[1], bucket)
        strip = cv2.resize(strip, (bucket, strip.shape[0]),
                           interpolation=cv2.INTER_AREA)
    strip = strip.astype(np.float32) / 255.0
    return 1.0 - strip, strip.shape[1]


class FakePredictor:
    line_height = 48

    def predict(self, strips):
        return ["text for %s." % "/".join(map(str, path))
                for path, _ in strips], [1.0] * len(strips)


class RecognizerPredictor:
    """One or more stacked recognizer models with greedy / voted decode.

    decoder="greedy" decodes on device; "beam" runs a host prefix beam
    search over per-frame distributions. With multiple models the
    default voting is SEQUENCE-level (vote="sequence"): each member
    decodes independently and per line the members vote on the text,
    confidence breaking ties — the Calamari MultiPredictor semantic
    (reference origami/batch/detect/ocr.py:33-67). vote="frames"
    averages the members' frame log-distributions before decoding;
    measured on the 2-seed bootstrap it DEGRADES CER 0.000 -> 0.041
    (CTC alignment drift between members smears the averaged peaks),
    so it exists only for comparison."""

    def __init__(self, model_paths, batch_size=128, decoder="greedy",
                 beam_width=10, vote="sequence"):
        import jax
        import jax.numpy as jnp
        from origami_tpu.models import registry, ctc
        from origami_tpu.models.recognizer import width_buckets

        models = [registry.load_model(p) for p in model_paths]
        self._module = models[0][0]
        metas = [m[2] for m in models]
        self._charset = metas[0]["charset"]
        self.line_height = metas[0].get("height", 48)
        self._batch_size = batch_size
        self._voting = len(models) > 1
        if self._voting:
            params = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[m[1] for m in models])
        else:
            params = models[0][1]
        # pin weights on device once: host-resident params re-upload
        # the full model (~17 MB, ~0.4 s through the tunnel) on EVERY
        # recognizer dispatch
        self._params = jax.device_put(params)
        self._ctc = ctc
        self._width_buckets = width_buckets
        self._decoder = decoder
        self._beam_width = beam_width

        module = self._module

        def infer(params, x, widths):
            logits, pad = module.apply({"params": params}, x, widths=widths)
            return logits, pad

        def infer_members(params_stack, x, widths):
            def one(params):
                logits, pad = module.apply({"params": params}, x,
                                           widths=widths)
                return jax.nn.log_softmax(logits, axis=-1), pad
            return jax.vmap(one)(params_stack)   # (N, B, T, C), (N, B, T)

        def infer_voted(params_stack, x, widths):
            logps, pads = infer_members(params_stack, x, widths)
            return jnp.mean(logps, axis=0), pads[0]

        self._infer = jax.jit(infer)
        self._infer_voted = jax.jit(infer_voted)
        self._infer_members = jax.jit(infer_members)
        self._vote = vote

        def recognize_u8(params, strips_u8, widths):
            """Fused device path: normalize + infer + greedy decode on
            uint8 strips straight from the line extractor — texts come
            back as small id arrays; the padded strip batch never
            round-trips through the host (the tunnel moves ~10x the
            useful bytes otherwise). With sequence voting every member
            decodes on device; the (N, B, L) id arrays come back for
            the host-side per-line vote."""
            x = 1.0 - strips_u8.astype(jnp.float32)[..., None] / 255.0
            w = jnp.maximum(widths.astype(jnp.float32), 1.0)
            if self._voting and self._vote == "frames":
                logits, pad = infer_voted(params, x, w)
            elif self._voting:
                logps, pads = infer_members(params, x, w)
                return jax.vmap(ctc.greedy_decode)(logps, pads)
            else:
                logits, pad = infer(params, x, w)
            return ctc.greedy_decode(logits, pad)

        self._recognize_u8 = jax.jit(recognize_u8)

    def warm_buckets(self, buckets=None, tail_batches=(32, 64)):
        """Compile the recognizer graph for every width bucket up
        front. Each (batch, bucket) LSTM shape compiles in minutes
        through the remote TPU compiler (then disk-cached); without
        this, the first page that hits a new bucket stalls mid-batch.
        Defaults to the canonical 256-px ladder, at the full batch size
        plus the tail-batch ladder predict_device_deferred_multi uses."""
        import jax.numpy as jnp
        from origami_tpu.models.recognizer import strip_width_ladder
        if buckets is None:
            buckets = strip_width_ladder()
        for b in buckets:
            for nb in (self._batch_size,) + tuple(tail_batches):
                strips = jnp.full((nb, self.line_height, b),
                                  255, jnp.uint8)
                w = jnp.full((nb,), float(b), jnp.float32)
                ids, lengths, conf = self._recognize_u8(self._params,
                                                        strips, w)
                np.asarray(lengths)

    def supports_device_strips(self, wmax, bucket_cap=2048):
        """Device-resident groups need greedy decode and widths within
        the extractor's largest compile bucket (wider lines take the
        host path, which downscales them)."""
        return (self._decoder == "greedy"
                and bucket_cap is not None and wmax <= bucket_cap)

    def predict_device_deferred(self, strips_dev, widths, n):
        """Dispatch recognition of one padded on-device strip batch
        (nb, H, W) uint8 WITHOUT blocking (see
        predict_device_deferred_multi)."""
        return self.predict_device_deferred_multi(
            [(strips_dev, np.asarray(widths)[:n])])

    def predict_device_deferred_multi(self, parts):
        """Dispatch recognition over several on-device strip groups of
        the same width bucket — e.g. one group per page of a batch —
        WITHOUT blocking; finalize_device() reads the results (texts
        in part order).

        Every dispatch must hit a graph warm_buckets already compiled:
        the LSTM graph compiles in MINUTES through the remote TPU
        compiler, and even the "trivial" concat/pad/slice data-
        movement graphs the previous design built around it were shape-
        parametrized by the per-call (group count x group sizes)
        combination — every fresh combination minted remote compiles
        in the middle of production OCR (measured 102 s of 'dispatch'
        for 6 pages, bench r5; sub-second graphs aren't even persisted
        to the disk cache, so every process repaid them). Instead each
        part is dispatched DIRECTLY at its own static ladder shape
        (the extractor pads groups to nb in {32, 64, 128, ...} and
        widths to the 256-px bucket ladder): zero shape-varying ops,
        zero graphs beyond warm_buckets' set. An underfilled 32/64-row
        chunk costs far less than a single stray compile (0.14 s vs
        0.35 s for a full 128-row chunk at bucket 2048).

        parts: [(strips_dev (nb_i, H, W) uint8, widths (n_i,))];
        rows past n_i are padding the extractor materialized anyway.
        """
        import jax.numpy as jnp
        B = self._batch_size
        outs = []              # (n_valid, deferred result) in row order
        n = 0
        for dev, wd in parts:
            nb = dev.shape[0]
            n_i = len(wd)
            n += n_i
            w = np.ones((nb,), np.float32)
            w[:n_i] = np.asarray(wd, np.float32)
            if nb <= B:
                outs.append((n_i, self._recognize_u8(
                    self._params, dev, jnp.asarray(w))))
                continue
            # oversize group (>B lines in one page/bucket/profile
            # group — rare): static B-row slices; each (nb, off) pair
            # is one small slice graph, compiled on first hit
            for off in range(0, nb, B):
                valid = min(max(n_i - off, 0), B)
                if valid == 0:
                    break
                outs.append((valid, self._recognize_u8(
                    self._params, dev[off: off + B],
                    jnp.asarray(w[off: off + B]))))
        return outs, n

    @staticmethod
    def _align_ops(pivot, other):
        """Minimal-edit alignment of `other` onto `pivot`.

        Yields (slot, char) events: (k, ch) = member reads ch at pivot
        slot k ('' = the member deletes that slot); (-k - 1, ch) = the
        member inserts ch before pivot slot k."""
        n, m = len(pivot), len(other)
        # DP over edit distance with backtrace
        D = np.zeros((n + 1, m + 1), np.int32)
        D[:, 0] = np.arange(n + 1)
        D[0, :] = np.arange(m + 1)
        for i in range(1, n + 1):
            pi = pivot[i - 1]
            row = D[i]
            prev = D[i - 1]
            for j in range(1, m + 1):
                row[j] = min(prev[j] + 1, row[j - 1] + 1,
                             prev[j - 1] + (pi != other[j - 1]))
        i, j = n, m
        out = []
        while i > 0 or j > 0:
            if i > 0 and j > 0 and \
                    D[i, j] == D[i - 1, j - 1] + (pivot[i - 1]
                                                  != other[j - 1]):
                out.append((i - 1, other[j - 1]))
                i -= 1
                j -= 1
            elif i > 0 and D[i, j] == D[i - 1, j] + 1:
                out.append((i - 1, ""))           # slot deleted
                i -= 1
            else:
                out.append((-i - 1, other[j - 1]))  # insertion before i
                j -= 1
        return out

    def _vote_texts(self, cands):
        """Character-position voting over the member texts (Calamari
        ConfidenceVoter semantics, reference
        origami/batch/detect/ocr.py:33-67): each member's sequence is
        edit-aligned onto the highest-confidence member and every
        aligned position is voted independently — majority char wins,
        ties keep the pivot's reading. Single-character dropouts are
        member-specific, so a 3-member ensemble repairs them even when
        no two members agree on the full sequence. With 2 members ties
        dominate and the vote reduces to highest-confidence selection
        (ADVICE r4)."""
        import collections
        texts = [t for t, _ in cands]
        confs = [c for _, c in cands]
        if len(set(texts)) == 1:
            return texts[0], max(confs)
        piv_i = max(range(len(cands)), key=lambda i: confs[i])
        pivot = texts[piv_i]
        n = len(pivot)
        ballots = [collections.Counter() for _ in range(n)]
        ins = [collections.Counter() for _ in range(n + 1)]
        n_members = len(cands)
        for mi, t in enumerate(texts):
            if mi == piv_i:
                for k, ch in enumerate(pivot):
                    ballots[k][ch] += 1
                continue
            for slot, ch in self._align_ops(pivot, t):
                if slot >= 0:
                    ballots[slot][ch] += 1
                else:
                    ins[-slot - 1][ch] += 1
        out = []
        for k in range(n + 1):
            if ins[k]:
                ch, cnt = ins[k].most_common(1)[0]
                if cnt * 2 > n_members:   # strict insertion majority
                    out.append(ch)
            if k == n:
                break
            votes = ballots[k]
            top = max(votes.values())
            tied = [ch for ch, c in votes.items() if c == top]
            # ties keep the pivot's reading (it voted for pivot[k])
            out.append(pivot[k] if pivot[k] in tied else tied[0])
        text = "".join(out)
        if text in texts:
            return text, max(c for t, c in zip(texts, confs) if t == text)
        return text, confs[piv_i]

    def finalize_device(self, deferred):
        """(texts, confs) for a predict_device_deferred result: each
        chunk's first n_valid rows are real, the rest is ladder
        padding."""
        outs, n = deferred
        texts, confs = [], []
        for n_valid, (ids, lengths, conf) in outs:
            ids = np.asarray(ids)
            lengths = np.asarray(lengths)
            conf = np.asarray(conf)
            member_mode = ids.ndim == 3       # sequence voting: (N, B, L)
            for j in range(n_valid):
                if member_mode:
                    cands = [
                        (self._ctc.ids_to_text(
                            ids[m, j], lengths[m, j], self._charset),
                         float(conf[m, j]))
                        for m in range(ids.shape[0])]
                    t, c = self._vote_texts(cands)
                    texts.append(t)
                    confs.append(c)
                else:
                    texts.append(self._ctc.ids_to_text(
                        ids[j], lengths[j], self._charset))
                    confs.append(float(conf[j]))
        return texts, confs

    def predict_device(self, strips_dev, widths, n):
        """Blocking wrapper: dispatch + finalize in one call."""
        return self.finalize_device(
            self.predict_device_deferred(strips_dev, widths, n))

    def predict(self, strips):
        """strips: [(path, uint8 (H, W))] -> (texts, confidences)."""
        import jax.numpy as jnp
        n = len(strips)
        texts = [""] * n
        confs = [0.0] * n
        if n == 0:
            return texts, confs
        from origami_tpu.models.recognizer import strip_width_bucket
        # the SAME 256-px width ladder and batch-size ladder the device
        # path uses and warm_buckets compiles — the host path once
        # bucketed through a separate x1.5 ladder at nb=8, so a single
        # host-routed line minted an unwarmed LSTM compile (minutes via
        # the remote compiler) in the middle of a timed pass
        buckets = [strip_width_bucket(s.shape[1]) for _, s in strips]
        groups = {}
        for i, b in enumerate(buckets):
            groups.setdefault(b, []).append(i)
        for bucket, idxs in groups.items():
            for start in range(0, len(idxs), self._batch_size):
                part = idxs[start: start + self._batch_size]
                # pad the batch axis to the warmed static ladder: a
                # distinct batch size is a fresh LSTM jit compile
                # (minutes over the remote-compile tunnel), so partial
                # batches must not mint new graphs
                nb = min(b for b in {32, 64, self._batch_size}
                         if b >= len(part))
                if self._decoder == "greedy":
                    # reuse the warmed fused device graph
                    # (recognize_u8): same (nb, H, bucket) uint8 shapes
                    # warm_buckets compiled — the host path mints NO
                    # graphs of its own in production
                    u8 = np.full((nb, self.line_height, bucket),
                                 255, np.uint8)
                    w = np.ones((nb,), np.float32)
                    for j, i in enumerate(part):
                        s = strips[i][1]
                        if s.shape[1] > bucket:
                            import cv2
                            logging.warning(
                                "line %s wider than max bucket "
                                "(%d > %d px): downscaling",
                                "/".join(map(str, strips[i][0])),
                                s.shape[1], bucket)
                            s = cv2.resize(
                                s, (bucket, s.shape[0]),
                                interpolation=cv2.INTER_AREA)
                        sh = min(s.shape[0], self.line_height)
                        u8[j, :sh, : s.shape[1]] = s[:sh]
                        w[j] = s.shape[1]
                    ids, lengths, conf = self._recognize_u8(
                        self._params, jnp.asarray(u8), jnp.asarray(w))
                    ids = np.asarray(ids)
                    lengths = np.asarray(lengths)
                    conf = np.asarray(conf)
                    member_mode = ids.ndim == 3
                    for j, i in enumerate(part):
                        if member_mode:
                            cands = [
                                (self._ctc.ids_to_text(
                                    ids[m, j], lengths[m, j],
                                    self._charset),
                                 float(conf[m, j]))
                                for m in range(ids.shape[0])]
                            texts[i], confs[i] = self._vote_texts(cands)
                        else:
                            texts[i] = self._ctc.ids_to_text(
                                ids[j], lengths[j], self._charset)
                            confs[i] = float(conf[j])
                    continue
                x = np.zeros((nb, self.line_height, bucket, 1),
                             np.float32)
                w = np.ones((nb,), np.float32)
                for j, i in enumerate(part):
                    inv, sw = pack_strip(
                        strips[i][1], bucket, self.line_height,
                        name="/".join(map(str, strips[i][0])))
                    sh = min(inv.shape[0], self.line_height)
                    x[j, :sh, :sw, 0] = inv[:sh, :sw]
                    w[j] = sw
                import jax
                if self._voting and self._vote == "sequence":
                    # beam-decode every member separately, vote per
                    # line (frame-averaging the members' distributions
                    # measured CER 0.000 -> 0.041: CTC alignments
                    # drift between members and the averaged peaks
                    # smear)
                    logps, pads = self._infer_members(
                        self._params, jnp.asarray(x), jnp.asarray(w))
                    logp = np.asarray(logps)
                    pad_np = np.asarray(pads)
                    for j, i in enumerate(part):
                        cands = []
                        for m in range(logp.shape[0]):
                            T = int((pad_np[m, j] < 0.5).sum())
                            text, score = self._ctc.beam_search_decode(
                                logp[m, j, :T], self._charset,
                                beam_width=self._beam_width)
                            cands.append((text, float(np.exp(
                                score / max(len(text), 1)))))
                        texts[i], confs[i] = self._vote_texts(cands)
                    continue
                if self._voting:
                    logits, pad = self._infer_voted(
                        self._params, jnp.asarray(x), jnp.asarray(w))
                else:
                    logits, pad = self._infer(
                        self._params, jnp.asarray(x), jnp.asarray(w))
                logp = np.asarray(
                    jax.nn.log_softmax(logits, axis=-1))
                pad_np = np.asarray(pad)
                for j, i in enumerate(part):
                    T = int((pad_np[j] < 0.5).sum())
                    text, score = self._ctc.beam_search_decode(
                        logp[j, :T], self._charset,
                        beam_width=self._beam_width)
                    texts[i] = text
                    confs[i] = float(np.exp(
                        score / max(len(text), 1)))
        return texts, confs


class OCRProcessor(BatchedProcessor):
    """Batches line strips ACROSS pages: the width-bucketed recognizer
    graphs see fuller batches than any single page provides (the
    reference predicts per page, origami/batch/detect/ocr.py:255-267)."""

    def __init__(self, options):
        super().__init__(options,
                         batch_size=options.get("pages_per_batch", 4))
        self._opt = options
        self._model_spec = str(options.get("model", "FAKE"))
        self._predictor = None
        self._ignored = RegionsFilter(options.get(
            "ignored", "regions/ILLUSTRATION"))

    @property
    def processor_name(self):
        return "origami_tpu.batch.detect.ocr"

    def artifacts(self):
        return [
            ("reliable", Input(Artifact.LINES, Artifact.TABLES,
                               stage=Stage.RELIABLE)),
            ("output", Output(Artifact.OCR)),
        ]

    def _get_predictor(self):
        if self._predictor is None:
            spec = self._model_spec
            if spec.upper() in ("FAKE", "DRY"):
                self._predictor = FakePredictor()
            else:
                path = Path(spec)
                if (path / "meta.json").exists():
                    members = [path]
                else:
                    members = sorted(
                        d for d in path.iterdir()
                        if (d / "meta.json").exists())
                if not members:
                    raise FileNotFoundError(
                        "no recognizer models at %s" % path)
                self._predictor = RecognizerPredictor(
                    members,
                    batch_size=self._opt.get("batch_size", 128),
                    decoder=self._opt.get("decoder", "greedy"),
                    beam_width=self._opt.get("beam_width", 10),
                    vote=self._opt.get("vote", "sequence"))
        return self._predictor

    def process_batch(self, pages):
        predictor = self._get_predictor()
        dry = self._model_spec.upper() == "DRY"

        # page -> [(path, text)], assembled from device-resident
        # groups where possible and the host strip path otherwise
        page_texts = {}
        host_strips = []          # [(page_path, path, strip)]
        by_bucket = {}            # wmax -> [(page_path, paths, dev, widths)]
        infos = {}
        for page_path, kwargs in pages:
            with span("ocr.reliable_load"):
                reliable = kwargs["reliable"]
                extractor = LineExtractor(
                    reliable.tables, predictor.line_height, self._opt,
                    min_confidence=reliable.lines.min_confidence,
                    max_width=2048)
                parts = extractor.parts(reliable.lines.by_path,
                                        ignored=self._ignored)
            page_texts[page_path] = []
            if dry:
                for path, _, _ in parts:
                    logging.info("would OCR %s", "/".join(map(str, path)))
                infos[page_path] = dict(n_lines=len(parts), dry=True)
                continue
            device_ok = (extractor.binarizer is None
                         and hasattr(predictor, "predict_device_deferred"))
            with span("ocr.collect_groups"):
                groups_iter = list(extractor.device_groups(parts))
            for paths, dev, widths, wmax in groups_iter:
                if device_ok and predictor.supports_device_strips(
                        wmax, extractor.bucket_cap):
                    # collect only — recognition is dispatched per
                    # width bucket ACROSS the page batch below, so the
                    # 128-line recognizer chunks run full instead of
                    # one padded chunk per (page, bucket) group
                    by_bucket.setdefault(wmax, []).append(
                        (page_path, paths, dev, widths))
                else:
                    with span("ocr.host_strips"):
                        strips = np.asarray(dev)
                        for i, path in enumerate(paths):
                            strip = strips[i, :, : widths[i]]
                            if extractor.binarizer is not None:
                                strip = extractor.binarizer(strip)
                            host_strips.append((page_path, path, strip))
        if dry:
            return infos

        deferred = []
        with span("ocr.recognize_dispatch"):
            for wmax in sorted(by_bucket):
                groups = by_bucket[wmax]
                d = predictor.predict_device_deferred_multi(
                    [(dev, widths) for _, _, dev, widths in groups])
                deferred.append((groups, d))
        with span("ocr.finalize"):
            for groups, d in deferred:
                texts, _ = predictor.finalize_device(d)
                i = 0
                for page_path, paths, _, _ in groups:
                    page_texts[page_path].extend(
                        zip(paths, texts[i: i + len(paths)]))
                    i += len(paths)

        if host_strips:
            with span("ocr.host_predict"):
                texts, _ = predictor.predict(
                    [(path, strip) for _, path, strip in host_strips])
                for (page_path, path, _), text in zip(host_strips, texts):
                    page_texts[page_path].append((path, text))

        with span("ocr.write"):
            for page_path, kwargs in pages:
                entries = page_texts[page_path]
                with kwargs["output"].ocr() as zf:
                    for path, text in entries:
                        zf.writestr("/".join(map(str, path)) + ".txt", text)
                infos[page_path] = dict(n_lines=len(entries))
        return infos


@click.command()
@click.option("-m", "--model", type=str, default="FAKE",
              help="recognizer model dir (or ensemble parent dir), "
                   "FAKE, or DRY")
@click.option("-b", "--batch-size", type=int, default=128)
@click.option("--decoder", type=click.Choice(["greedy", "beam"]),
              default="greedy",
              help="device greedy decode vs host prefix beam search")
@click.option("--beam-width", type=int, default=10)
@click.option("--vote", type=click.Choice(["sequence", "frames"]),
              default="sequence",
              help="multi-model voting: per-line sequence vote "
                   "(Calamari semantics) vs frame-distribution "
                   "averaging (measured worse; comparison only)")
@click.option("--ignored", type=str, default="regions/ILLUSTRATION")
@click.argument("data_path", type=click.Path(exists=True), required=True)
@Processor.options
@LineExtractor.options
def run_ocr(data_path, **kwargs):
    """Run OCR on all documents in DATA_PATH."""
    OCRProcessor(kwargs).traverse(data_path)


if __name__ == "__main__":
    run_ocr()
