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
import logging
import os

_initialized = False

# env vars that mark a managed multi-host launch where
# jax.distributed.initialize() can auto-detect the topology
_AUTO_ENV = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
             "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")


def maybe_initialize(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Initialize jax.distributed when running under a multi-host launch.

    Explicit arguments win; otherwise a manual fleet is recognized via
    ORIGAMI_TPU_COORDINATOR / ORIGAMI_TPU_NUM_PROCESSES /
    ORIGAMI_TPU_PROCESS_ID, and a managed launch (GKE / Cloud TPU pod)
    via the usual coordinator env vars, where initialize() auto-detects
    the topology. Single-process settings are a no-op. Returns True iff
    the distributed runtime is active with more than one process.

    Must run before the first jax computation (Processor.traverse calls
    it first thing)."""
    global _initialized
    import jax
    if not _initialized:
        env = os.environ
        coordinator_address = (coordinator_address or
                               env.get("ORIGAMI_TPU_COORDINATOR"))
        if num_processes is None and env.get("ORIGAMI_TPU_NUM_PROCESSES"):
            num_processes = int(env["ORIGAMI_TPU_NUM_PROCESSES"])
        if process_id is None and env.get("ORIGAMI_TPU_PROCESS_ID"):
            process_id = int(env["ORIGAMI_TPU_PROCESS_ID"])
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id,
                local_device_ids=local_device_ids)
            _initialized = True
            logging.info("jax.distributed up: process %d/%d",
                         jax.process_index(), jax.process_count())
        elif any(k in env for k in _AUTO_ENV):
            # a managed-launch marker is present, but single-chip
            # environments (e.g. the axon tunnel) set some of these
            # too — treat auto-detection failure as "not multi-host"
            try:
                jax.distributed.initialize()
                _initialized = True
                logging.info("jax.distributed up (auto): process %d/%d",
                             jax.process_index(), jax.process_count())
            except (ValueError, RuntimeError) as e:
                logging.debug("jax.distributed auto-init declined: %s",
                              e)
    if not _initialized:
        # no distributed launch was configured: answer without touching
        # jax.process_count(), which forces full backend init (plugin
        # attach) — a single-host CLI stage must not block on the TPU
        # plugin (e.g. a dead tunnel) just to learn it isn't multi-host
        return False
    try:
        return jax.process_count() > 1
    except RuntimeError:
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
