"""Multi-host work assignment.

The reference coordinates nodes through a SQLite lock database on a
shared filesystem (origami/batch/core/mutex.py). On a TPU pod slice the
assignment is deterministic instead: every host processes the pages whose
stable hash lands on its `jax.process_index()` — no lock traffic on the
corpus path. The lock DB remains available (batch.core.mutex) for mixed
CPU/TPU fleets writing one artifact tree.
"""

from __future__ import annotations

import hashlib


def maybe_initialize():
    """Initialize jax.distributed when running under a multi-host launcher
    (no-op in single-process settings)."""
    import jax
    try:
        if jax.process_count() > 1:
            return True
    except RuntimeError:
        pass
    return False


def process_info():
    import jax
    try:
        return jax.process_index(), jax.process_count()
    except RuntimeError:
        return 0, 1


def stable_shard(path, n_shards):
    """Deterministic shard id for a page path."""
    h = hashlib.blake2s(str(path).encode("utf8"), digest_size=8)
    return int.from_bytes(h.digest(), "little") % max(n_shards, 1)


def my_pages(paths, index=None, count=None):
    """The subset of corpus pages this host is responsible for."""
    if index is None or count is None:
        index, count = process_info()
    if count <= 1:
        return list(paths)
    return [p for p in paths if stable_shard(p, count) == index]
