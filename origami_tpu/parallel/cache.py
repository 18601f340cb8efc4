"""Persistent XLA compilation cache.

First compiles are expensive (tens of seconds locally, minutes through a
remote-compile tunnel); the batch CLIs enable jax's persistent cache so
every page-size bucket / model shape compiles once per machine, not once
per process. Disable with ORIGAMI_TPU_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def apply_platform_override():
    """Honor ORIGAMI_TPU_PLATFORM=cpu|tpu|axon: some TPU plugins (axon)
    override JAX_PLATFORMS programmatically, so an env var the runtime
    applies via jax.config is the only reliable user-side switch."""
    want = os.environ.get("ORIGAMI_TPU_PLATFORM")
    if not want:
        return
    try:
        import jax
        jax.config.update("jax_platforms", want)
    except Exception:
        pass


def ensure_compilation_cache(cache_dir=None):
    global _DONE
    apply_platform_override()
    if _DONE or os.environ.get("ORIGAMI_TPU_NO_COMPILE_CACHE") == "1":
        return
    _DONE = True
    try:
        import jax
        path = Path(cache_dir or os.environ.get(
            "ORIGAMI_TPU_COMPILE_CACHE",
            Path.home() / ".cache" / "origami_tpu" / "jax"))
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # persist EVERYTHING: sub-second graphs (strip-extract slabs,
        # pad/concat helpers) are exactly what a fresh process repays
        # ~30x per corpus pass through the remote compiler — the r4
        # driver bench charged ~100 s of them to the ocr stage
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass
