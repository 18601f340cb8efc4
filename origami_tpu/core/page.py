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


class Page:
    def __init__(self, path=None, dewarping_grid=None, pixels=None):
        if pixels is not None:
            self._pixels = np.asarray(pixels)
            if self._pixels.ndim == 3:
                self._pixels = np.asarray(
                    PIL.Image.fromarray(self._pixels).convert("L"))
            self._path = Path(path) if path else None
        else:
            self._path = find_image_path(path)
            self._pixels = np.asarray(
                PIL.Image.open(str(self._path)).convert("L"))
        self._grid = dewarping_grid

    @property
    def path(self):
        return self._path

    @property
    def warped(self):
        return self._pixels

    def _dewarped_slot(self):
        # process-wide LRU: every stage constructs its own Page, but
        # within one process (PagePipeline, BatchedProcessor runs) the
        # full-page remap is identical across stages — cache by file
        # identity so layout/lines/ocr reuse dewarp's work. The slot
        # holds the DEVICE array (what on-device consumers need) and
        # lazily materializes the host copy at most once.
        key = None
        if self._path is not None:
            try:
                g = self._grid
                fp = (g.resolution, g._hv.shape,
                      float(g._hv.sum()), float(g._hv[-1, -1].sum()))
                key = (str(self._path), self._path.stat().st_mtime, fp)
            except (OSError, AttributeError):
                key = None
        if key is not None and key in _DEWARPED_LRU:
            _DEWARPED_LRU.move_to_end(key)
            return _DEWARPED_LRU[key]
        from origami_tpu.core.dewarp import Dewarper
        slot = {"dev": Dewarper(self.device_pixels, self._grid,
                                shape=self._pixels.shape).dewarped_dev,
                "host": None}
        if key is not None:
            _DEWARPED_LRU[key] = slot
            while len(_DEWARPED_LRU) > 12:
                _DEWARPED_LRU.popitem(last=False)
        return slot

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
        return Dewarper(self._pixels, self._grid)

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
        h, w = self._pixels.shape[:2]
        return (w, h)

    def geometry(self, dewarped=False):
        return Geometry(*self.size(dewarped))

    def pixels(self, dewarped=False):
        return self.dewarped if dewarped else self._pixels

    @cached_property
    def device_pixels(self):
        import jax.numpy as jnp
        key = None
        if self._path is not None:
            try:
                key = (str(self._path), self._path.stat().st_mtime,
                       self._pixels.shape)
            except OSError:
                key = None
        if key is not None and key in _DEVICE_PIXELS_LRU:
            _DEVICE_PIXELS_LRU.move_to_end(key)
            return _DEVICE_PIXELS_LRU[key]
        dev = jnp.asarray(self._pixels)
        if key is not None:
            _DEVICE_PIXELS_LRU[key] = dev
            while len(_DEVICE_PIXELS_LRU) > 12:
                _DEVICE_PIXELS_LRU.popitem(last=False)
        return dev

    @cached_property
    def binarized(self):
        """Sauvola-binarized warped page (True = paper) as numpy.

        Transferred bit-packed (8x fewer bytes over the tunnel)."""
        from origami_tpu.ops.binarize import sauvola_packed
        packed = np.asarray(sauvola_packed(self.device_pixels, 15))
        return np.unpackbits(packed, axis=1)[
            :, : self._pixels.shape[1]].astype(bool)

    @cached_property
    def dewarped_binarized(self):
        from origami_tpu.ops.binarize import sauvola_packed
        dev = self.dewarped_dev
        packed = np.asarray(sauvola_packed(dev, 15))
        return np.unpackbits(packed, axis=1)[
            :, : dev.shape[1]].astype(bool)
