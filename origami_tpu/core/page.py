"""Page: image loading + geometry + device-resident pixel access.

Mirrors the reference Page contract (origami/core/page.py:65-117 —
grayscale PIL load, extension-tolerant path resolution, optional dewarper,
cached Sauvola binarization) but keeps a device copy of the pixels so the
jit pipelines consume the page without repeated host->HBM transfers.
"""

from __future__ import annotations

import collections
from functools import cached_property
from pathlib import Path

import numpy as np
import PIL.Image

from origami_tpu.core.math import Geometry

_IMAGE_SUFFIXES = (".jpg", ".jpeg", ".png", ".tif", ".tiff", ".jp2", ".bmp")


def find_image_path(path):
    """Resolve a page path tolerating a different image extension."""
    path = Path(path)
    if path.exists():
        return path
    candidates = [c for c in path.parent.glob(path.stem + ".*")
                  if c.suffix.lower() in _IMAGE_SUFFIXES]
    if len(candidates) != 1:
        raise FileNotFoundError(path)
    return candidates[0]


def is_image(path):
    return Path(path).suffix.lower() in _IMAGE_SUFFIXES


# (path, mtime) -> dewarped page pixels; see Page.dewarped
_DEWARPED_LRU = collections.OrderedDict()

# (path, mtime) -> device-resident warped pixels: every stage builds
# its own Page, and re-uploading the full page through the ~10-17 MB/s
# tunnel costs ~0.2 s per stage per page
_DEVICE_PIXELS_LRU = collections.OrderedDict()

# (path, mtime) -> decoded grayscale pixels: PNG decode is ~50 ms/page
# and EVERY stage constructs its own Page (profiled at 0.3-0.6 s/stage
# over 6 pages); the order stage only ever needs the page SIZE, so
# decode is also lazy (PIL reads w/h from the header without decoding)
_PIXELS_LRU = collections.OrderedDict()

# (path, mtime, space_key) -> binarized bool mask: Sauvola runs on
# device and the unpacked result is re-derived per stage otherwise
# (flow + layout + lines each paid the dispatch + tunnel transfer);
# holds warped AND dewarped masks of every in-flight runner wave
# (~4 MB per 2400x1600 page mask) — caps below.
_BINARIZED_LRU = collections.OrderedDict()

# Caps sized for the overlapped runner's worst case: with wave_size W
# the runner holds up to THREE waves of pages alive at once (prefetch /
# active / finalize), and the binarized cache holds TWO spaces (warped
# + dewarped) per page. A cap that is *exactly* 3W is a trap — one
# stray page (warmup, a straggler from the previous corpus pass)
# cascades into evict->rederive loops (full-page remap + Sauvola +
# tunnel transfer each, ~0.5 s/page). Budget: ~4 MB/page host-side per
# cache entry, so even 48 mask entries is <200 MB. set_cache_budget()
# lets the runner resize for larger waves.
_PIXELS_CAP = 24
_DEWARPED_CAP = 24
_DEVICE_PIXELS_CAP = 24
_BINARIZED_CAP = 48


def set_cache_budget(pages_in_flight):
    """Resize the page caches for a runner keeping this many pages alive.

    Caps are pages_in_flight + 4 slack (binarized: x2 spaces) so an
    overlapped run never thrashes; shrinking below the defaults is not
    allowed (sequential runs keep the generous default).
    """
    global _PIXELS_CAP, _DEWARPED_CAP, _DEVICE_PIXELS_CAP, _BINARIZED_CAP
    n = int(pages_in_flight) + 4
    _PIXELS_CAP = max(_PIXELS_CAP, n)
    _DEWARPED_CAP = max(_DEWARPED_CAP, n)
    _DEVICE_PIXELS_CAP = max(_DEVICE_PIXELS_CAP, n)
    _BINARIZED_CAP = max(_BINARIZED_CAP, 2 * n)


# hit/miss/eviction counters per cache (perf forensics: an eviction in
# a pipelined run means a full re-derivation — remap, Sauvola, tunnel
# transfer — so the overlapped runner MUST stay under every cap)
CACHE_STATS = collections.defaultdict(lambda: [0, 0, 0])  # hits, misses, evictions


def _lru_get(lru, key, name):
    if key is not None and key in lru:
        CACHE_STATS[name][0] += 1
        lru.move_to_end(key)
        return lru[key]
    CACHE_STATS[name][1] += 1
    return None


def _lru_put(lru, key, value, cap=12, name=None):
    lru[key] = value
    while len(lru) > cap:
        lru.popitem(last=False)
        if name is not None:
            CACHE_STATS[name][2] += 1


def cache_stats():
    """{cache: dict(hits, misses, evictions)} since process start."""
    return {k: dict(hits=v[0], misses=v[1], evictions=v[2])
            for k, v in CACHE_STATS.items()}


class Page:
    def __init__(self, path=None, dewarping_grid=None, pixels=None):
        self._lazy_size = None
        if pixels is not None:
            self._pixels = np.asarray(pixels)
            if self._pixels.ndim == 3:
                self._pixels = np.asarray(
                    PIL.Image.fromarray(self._pixels).convert("L"))
            self._path = Path(path) if path else None
        else:
            self._path = find_image_path(path)
            self._pixels = None          # decoded lazily, LRU-cached
        self._grid = dewarping_grid

    def _file_key(self, *extra):
        if self._path is None:
            return None
        try:
            return (str(self._path), self._path.stat().st_mtime) + extra
        except OSError:
            return None

    def _decode(self):
        key = self._file_key()
        cached = _lru_get(_PIXELS_LRU, key, "pixels")
        if cached is not None:
            return cached
        px = np.asarray(PIL.Image.open(str(self._path)).convert("L"))
        if key is not None:
            _lru_put(_PIXELS_LRU, key, px, cap=_PIXELS_CAP, name="pixels")
        return px

    @property
    def path(self):
        return self._path

    @property
    def warped(self):
        if self._pixels is None:
            self._pixels = self._decode()
        return self._pixels

    def _dewarped_slot(self):
        # process-wide LRU: every stage constructs its own Page, but
        # within one process (PagePipeline, BatchedProcessor runs) the
        # full-page remap is identical across stages — cache by file
        # identity so layout/lines/ocr reuse dewarp's work. The slot
        # holds the DEVICE array (what on-device consumers need) and
        # lazily materializes the host copy at most once.
        key = self._file_key(self._grid_fp())
        cached = _lru_get(_DEWARPED_LRU, key, "dewarped")
        if cached is not None:
            return cached
        from origami_tpu.core.dewarp import Dewarper
        slot = {"dev": Dewarper(self.device_pixels, self._grid,
                                shape=self.warped.shape).dewarped_dev,
                "host": None}
        if key is not None:
            _lru_put(_DEWARPED_LRU, key, slot,
                     cap=_DEWARPED_CAP, name="dewarped")
        return slot

    def _grid_fp(self):
        try:
            g = self._grid
            return (g.resolution, g._hv.shape,
                    float(g._hv.sum()), float(g._hv[-1, -1].sum()))
        except AttributeError:
            return None

    @property
    def dewarped_dev(self):
        """Dewarped page as a DEVICE array (no tunnel transfer)."""
        if self._grid is None:
            return None
        return self._dewarped_slot()["dev"]

    @cached_property
    def dewarped(self):
        if self._grid is None:
            return None
        slot = self._dewarped_slot()
        if slot["host"] is None:
            slot["host"] = np.asarray(slot["dev"])
        return slot["host"]

    @property
    def dewarper(self):
        if self._grid is None:
            return None
        from origami_tpu.core.dewarp import Dewarper
        return Dewarper(self.warped, self._grid)

    @property
    def grid(self):
        return self._grid

    def size(self, dewarped=False):
        if dewarped and self._grid is not None:
            # the dewarped canvas is the upsampled grid extent
            # (hv rows/cols x resolution, dewarp._upsample_hv_planes)
            # which is a few % larger than the warped page — derive it
            # from the grid without materializing the remap
            hv = self._grid._hv
            res = self._grid.resolution
            return (int(hv.shape[1] * res), int(hv.shape[0] * res))
        if self._pixels is None:
            # header-only read: the order stage needs the page size but
            # never its pixels — don't force a decode for it
            if self._lazy_size is None:
                with PIL.Image.open(str(self._path)) as im:
                    self._lazy_size = im.size
            return self._lazy_size
        h, w = self._pixels.shape[:2]
        return (w, h)

    def geometry(self, dewarped=False):
        return Geometry(*self.size(dewarped))

    def pixels(self, dewarped=False):
        return self.dewarped if dewarped else self.warped

    @cached_property
    def device_pixels(self):
        import jax.numpy as jnp
        key = self._file_key()
        cached = _lru_get(_DEVICE_PIXELS_LRU, key, "device_pixels")
        if cached is not None:
            return cached
        dev = jnp.asarray(self.warped)
        if key is not None:
            _lru_put(_DEVICE_PIXELS_LRU, key, dev,
                     cap=_DEVICE_PIXELS_CAP, name="device_pixels")
        return dev

    @cached_property
    def binarized(self):
        """Sauvola-binarized warped page (True = paper) as numpy.

        Transferred bit-packed (8x fewer bytes over the tunnel);
        process-wide LRU — flow, layout and lines all consume it."""
        key = self._file_key("warped-bin")
        cached = _lru_get(_BINARIZED_LRU, key, "binarized")
        if cached is not None:
            return cached
        from origami_tpu.ops.binarize import sauvola_packed
        packed = np.asarray(sauvola_packed(self.device_pixels, 15))
        out = np.unpackbits(packed, axis=1)[
            :, : self.size(False)[0]].astype(bool)
        if key is not None:
            _lru_put(_BINARIZED_LRU, key, out,
                     cap=_BINARIZED_CAP, name="binarized")
        return out

    @cached_property
    def dewarped_binarized(self):
        key = self._file_key("dewarped-bin", self._grid_fp())
        cached = _lru_get(_BINARIZED_LRU, key, "binarized")
        if cached is not None:
            return cached
        from origami_tpu.ops.binarize import sauvola_packed
        dev = self.dewarped_dev
        packed = np.asarray(sauvola_packed(dev, 15))
        out = np.unpackbits(packed, axis=1)[
            :, : dev.shape[1]].astype(bool)
        if key is not None:
            _lru_put(_BINARIZED_LRU, key, out,
                     cap=_BINARIZED_CAP, name="binarized")
        return out
