"""Batch runtime: corpus traversal, work queue, workers, watchdog.

The scheduler of the framework, with the reference's operational
semantics (origami/batch/core/processor.py): walk a corpus directory,
queue pages whose declared inputs exist and outputs don't, process them
under chunked cross-process locks, capture failures into runtime.json and
keep going, watchdog-kill stalled worker pools, support re-run diffing.

TPU-first difference: host geometry stages parallelize with a process
pool as before, but NN stages (segment/ocr) subclass `BatchedProcessor`,
which groups ready pages into device batches so one jit-compiled graph
handles many pages per dispatch instead of per-page model calls — the
pool's data parallelism moves onto the device batch axis (and across
hosts via origami_tpu.parallel.multihost shard assignment).
"""

from __future__ import annotations

import json
import logging
import multiprocessing
import os
import re
import sys
import threading
import time
import traceback
from pathlib import Path

import click

from origami_tpu.batch.core import mutex as _mutex
from origami_tpu.batch.core.io import (
    AtomicFileWriter, TrackChangeWriter, DebuggingFileWriter,
    Artifact, find_data_path)
from origami_tpu.core.page import is_image
from origami_tpu.core.utils import elapsed_timer


class Watchdog(threading.Thread):
    """Terminates a stalled pool after `timeout` seconds of no completed
    pages; a second strike hard-exits the process.

    `work_set` (shared dict pid -> (page, since)) is the in-flight work
    registry the workers maintain (the reference keeps the same
    bookkeeping in shared memory, origami/batch/core/processor.py:80-163)
    — on a stall the watchdog names exactly which pages are stuck in
    which worker, and the caller can reconcile them after termination."""

    def __init__(self, pool, timeout, heartbeat, work_set=None):
        super().__init__(daemon=True)
        self._pool = pool
        self._timeout = timeout
        self._heartbeat = heartbeat
        self._work_set = work_set
        self._done = threading.Event()
        self._cancelled = False
        self._strikes = 0
        self.stuck = []

    def _report_stuck(self):
        if self._work_set is None:
            return
        try:
            now = time.time()
            for pid, (page, since) in dict(self._work_set).items():
                age = now - since
                if age > self._timeout / 2:
                    self.stuck.append((page, pid, age))
                    logging.error(
                        "watchdog: worker %s stuck on %s for %.0fs",
                        pid, page, age)
        except Exception:
            pass

    def run(self):
        while not self._done.wait(min(self._timeout / 4, 15)):
            if time.time() - self._heartbeat.value > self._timeout:
                self._strikes += 1
                if self._strikes == 1:
                    logging.error("watchdog: no progress in %ds, "
                                  "terminating pool", self._timeout)
                    self._report_stuck()
                    self._cancelled = True
                    self._pool.terminate()
                else:
                    logging.error("watchdog: second strike, exiting")
                    os._exit(1)

    def set_done(self):
        self._done.set()

    @property
    def cancelled(self):
        return self._cancelled


def _current_jax_platforms():
    try:
        import jax
        return jax.config.jax_platforms
    except Exception:
        return None


def _chunks(items, n):
    for i in range(0, len(items), n):
        yield items[i:i + n]


# worker globals (initialized per spawned worker)
_worker_self = None
_worker_heartbeat = None
_worker_work_set = None


def _worker_run_chunk(chunk):
    """chunk: [(index, path_str)] — readers/writers are rebuilt in the
    worker (prepare_process), so nothing jax- or lambda-laden crosses
    the process boundary. Each page is registered in the shared
    in-flight work set while it runs."""
    results = []
    for i, path in _worker_self._run_chunk_paths(
            [(i, Path(p)) for i, p in chunk]):
        results.append((i, str(path)))
        if _worker_heartbeat is not None:
            _worker_heartbeat.value = time.time()
    if _worker_work_set is not None:
        _worker_work_set.pop(os.getpid(), None)
    return results


def _worker_init(factory, factory_args, heartbeat, mutex,
                 jax_platforms, work_set=None):
    global _worker_self, _worker_heartbeat, _worker_work_set
    if jax_platforms:
        # inherit the parent's backend choice (spawned children don't
        # see config set after import, and the axon plugin overrides
        # the env var)
        import jax
        jax.config.update("jax_platforms", jax_platforms)
    _worker_self = factory(*factory_args)
    _worker_self._worker_mutex = mutex
    _worker_heartbeat = heartbeat
    _worker_work_set = work_set


class Processor:
    LOCK_CHUNK_SIZE = 25

    def __init__(self, options=None):
        options = options or {}
        self._options = dict(options)
        self._overwrite = options.get("overwrite", False)
        self._processes = options.get("processes", 1)
        self._timeout = options.get("alive", 600)
        self._name_filter = options.get("name", "")
        self._lock_strategy = options.get("lock_strategy", "DB")
        self._lock_level = options.get("lock_level", "PAGE")
        self._lock_timeout = options.get("lock_timeout", 60)
        self._max_lock_age = options.get("max_lock_age", 600)
        self._lock_database = options.get("lock_database")
        self._plain = options.get("plain", False)
        self._debug_write = options.get("debug_write", False)
        self._track_changes = options.get("track_changes", "")
        self._profile = options.get("profile", False)
        if self._profile:
            self._overwrite = True
        self._mutex = None
        self._worker_mutex = None
        self._verbose = False

    # -- CLI ---------------------------------------------------------------
    @staticmethod
    def options(f):
        opts = [
            click.option("--processes", type=int, default=1,
                         help="Number of parallel worker processes."),
            click.option("--alive", type=int, default=600,
                         help="Watchdog timeout in seconds."),
            click.option("--name", type=str, default="",
                         help="Only process paths matching this regex."),
            click.option("--lock-strategy",
                         type=click.Choice(["FILE", "DB", "NONE"],
                                           case_sensitive=False),
                         default="DB"),
            click.option("--lock-level",
                         type=click.Choice(["PAGE", "TASK"],
                                           case_sensitive=False),
                         default="PAGE"),
            click.option("--lock-database", type=click.Path(),
                         required=False),
            click.option("--lock-timeout", type=int, default=60),
            click.option("--max-lock-age", type=int, default=600),
            click.option("--overwrite", is_flag=True, default=False,
                         help="Recompute and overwrite existing artifacts."),
            click.option("--profile", is_flag=True, default=False,
                         help="Profile processing (device + host traces)."),
            click.option("--plain", is_flag=True, default=False,
                         help="Pipe-friendly plain output."),
            click.option("--debug-write", is_flag=True, default=False),
            click.option("--track-changes", type=str, default="",
                         help="Recompute artifacts, marking changed ones."),
        ]
        for o in opts:
            f = o(f)
        return f

    @property
    def processor_name(self):
        return self.__class__.__name__

    # -- stage contract ----------------------------------------------------
    def artifacts(self):
        """Override: [(kwarg_name, Input(...)/Output(...)), ...]."""
        return []

    def process(self, page_path, **kwargs):
        raise NotImplementedError

    def should_process(self, page_path):
        return True

    # -- queue construction ------------------------------------------------
    def _file_writer(self):
        if self._track_changes:
            return TrackChangeWriter(self._track_changes)
        w = AtomicFileWriter(overwrite=self._overwrite)
        if self._debug_write:
            w = DebuggingFileWriter(w)
        return w

    def prepare_process(self, page_path):
        kwargs = {}
        writer = self._file_writer()
        for arg, spec in self.artifacts():
            f = spec.instantiate(page_path=page_path, processor=self,
                                 file_writer=writer)
            f.fix_inconsistent()
            if not f.is_ready():
                return False
            kwargs[arg] = f
        return kwargs

    def _queue_add(self, queued, p):
        if not p.exists():
            return
        if self._name_filter and not re.search(self._name_filter, str(p)):
            return
        if not is_image(p):
            return
        if not self.should_process(p):
            return
        kwargs = self.prepare_process(p)
        if kwargs is not False:
            queued.append((len(queued), p, kwargs))

    def _build_queue(self, path):
        if isinstance(path, (list, tuple)):
            queued = []
            for p in path:
                self._queue_add(queued, Path(p))
            return queued
        path = Path(path)
        if not path.exists():
            raise FileNotFoundError(path)
        queued = []

        def add(p):
            self._queue_add(queued, p)

        if path.is_dir():
            for folder, dirs, files in os.walk(path):
                folder = Path(folder)
                if folder.name.endswith(".out"):
                    dirs.clear()
                    continue
                dirs.sort()
                for fn in sorted(files):
                    add(folder / fn)
        elif path.suffix == ".txt":
            for line in path.read_text().splitlines():
                line = line.strip()
                if line:
                    add(Path(line))
        else:
            add(path)
        return queued

    # -- execution ---------------------------------------------------------
    def lock_or_open(self, path, mode):
        if self._lock_strategy == "FILE":
            import portalocker
            return portalocker.Lock(path, mode, flags=portalocker.LOCK_EX,
                                    timeout=1, fail_when_locked=True)
        return open(path, mode)

    def _run_page(self, page_path, kwargs, locked):
        if not locked:
            logging.warning("no lock for %s; skipping", page_path)
            return
        # a concurrent worker may have completed this page meanwhile
        for f in kwargs.values():
            if not f.is_ready():
                return
        try:
            with elapsed_timer() as elapsed:
                data_path = find_data_path(page_path)
                data_path.mkdir(exist_ok=True)
                info = self.process(page_path, **kwargs) or {}
            info["status"] = "COMPLETED"
            info["elapsed"] = round(elapsed(), 2)
            self._update_runtime_info(page_path, {self.processor_name: info})
        except KeyboardInterrupt:
            raise
        except Exception:
            logging.exception("failed to process %s", page_path)
            self._update_runtime_info(page_path, {self.processor_name: dict(
                status="FAILED", traceback=traceback.format_exc())})
        finally:
            kwargs.clear()

    def _run_chunk(self, chunk):
        actor = "page" if self._lock_level == "PAGE" else self.processor_name
        with self._mutex.lock(actor,
                              [str(p) for _, p, _ in chunk]) as locked:
            for i, p, kwargs in chunk:
                self._run_page(p, kwargs, locked)
                yield i, p

    def _run_chunk_paths(self, chunk):
        """Worker-side variant: chunk = [(i, path)]; readers/writers are
        constructed here (in the worker process). The page currently
        being processed is registered in the shared in-flight work set
        so the watchdog can name stuck pages."""
        if self._mutex is None:
            self._mutex = self._worker_mutex
        actor = "page" if self._lock_level == "PAGE" else self.processor_name
        pid = os.getpid()
        with self._mutex.lock(actor,
                              [str(p) for _, p in chunk]) as locked:
            for i, p in chunk:
                if _worker_work_set is not None:
                    _worker_work_set[pid] = (str(p), time.time())
                kwargs = self.prepare_process(p)
                if kwargs is False:
                    yield i, p
                    continue
                self._run_page(p, kwargs, locked)
                yield i, p

    def spawn_factory(self):
        """(callable, args) rebuilding this processor in a worker."""
        return self.__class__, (self._options,)

    def _make_mutex(self, path):
        if isinstance(path, (list, tuple)):
            path = Path(path[0]).parent if path else Path(".")
        if self._lock_strategy == "DB":
            if self._lock_database:
                db = Path(self._lock_database)
            elif Path(path).is_dir():
                db = Path(path) / "origami.lock.db"
            else:
                db = Path(path).parent / "origami.lock.db"
            m = _mutex.DatabaseMutex(db, timeout=self._lock_timeout)
            m.clear_locks(self._max_lock_age)
            return m
        return _mutex.make_mutex(self._lock_strategy)

    def traverse(self, path):
        from origami_tpu.parallel import multihost
        from origami_tpu.parallel.cache import ensure_compilation_cache
        multi = multihost.maybe_initialize()
        ensure_compilation_cache()
        if not self._plain:
            print("running %s." % self.processor_name, flush=True)
        queued = self._build_queue(path)
        if multi:
            # deterministic cross-host sharding: each host only queues
            # the pages whose stable hash lands on its process index
            # (locks still guard against mixed/overlapping fleets)
            index, count = multihost.process_info()
            keep = set(multihost.my_pages(
                [p for _, p, _ in queued], index=index, count=count))
            queued = [(i, p, kw) for i, p, kw in queued if p in keep]
            queued = [(j, p, kw)
                      for j, (_, p, kw) in enumerate(queued)]
            print("host %d/%d: %d pages assigned."
                  % (index, count, len(queued)), flush=True)
        self._mutex = self._make_mutex(path)
        profiler = None
        device_trace = None
        if self._profile:
            import cProfile
            profiler = cProfile.Profile()
            profiler.enable()
            try:
                import jax
                p0 = Path(path[0]) if isinstance(path, (list, tuple)) \
                    else Path(path)
                trace_dir = str(p0.parent if not p0.is_dir() else p0)
                device_trace = jax.profiler.trace(
                    trace_dir + "/jax-trace")
                device_trace.__enter__()
            except Exception:
                device_trace = None
        try:
            self._process_queue(queued)
        finally:
            self._mutex = None
            if device_trace is not None:
                try:
                    device_trace.__exit__(None, None, None)
                except Exception:
                    pass
            if profiler is not None:
                import pstats
                profiler.disable()
                pstats.Stats(profiler).sort_stats(
                    "cumulative").print_stats(30)

    def _process_queue(self, queued):
        n = len(queued)
        if n == 0:
            if not self._plain:
                print("nothing to process.")
            return
        done = 0
        t0 = time.time()

        def progress(i, p):
            nonlocal done
            done += 1
            if self._plain:
                print("[%d/%d] %s" % (done, n, p), flush=True)
            elif done == n or done % 10 == 0:
                rate = done / max(time.time() - t0, 1e-6)
                print("\r[%d/%d] %.2f pages/s" % (done, n, rate),
                      end="" if done < n else "\n", flush=True)

        if self._processes > 1:
            # spawn, not fork: the parent has initialized jax/XLA whose
            # internal threads deadlock forked children. Workers rebuild
            # the processor via spawn_factory and re-derive their
            # readers/writers from page paths.
            ctx = multiprocessing.get_context("spawn")
            heartbeat = ctx.Value("d", time.time())
            manager = ctx.Manager()
            work_set = manager.dict()
            factory, fargs = self.spawn_factory()
            path_chunks = [[(i, str(p)) for i, p, _ in chunk]
                           for chunk in _chunks(queued,
                                                self.LOCK_CHUNK_SIZE)]
            with ctx.Pool(self._processes, maxtasksperchild=4,
                          initializer=_worker_init,
                          initargs=(factory, fargs, heartbeat,
                                    self._mutex,
                                    _current_jax_platforms(),
                                    work_set)) as pool:
                watchdog = Watchdog(pool, self._timeout, heartbeat,
                                    work_set=work_set)
                watchdog.start()
                for results in pool.imap_unordered(
                        _worker_run_chunk, path_chunks):
                    heartbeat.value = time.time()
                    for i, p in results:
                        progress(i, p)
                watchdog.set_done()
                if watchdog.cancelled:
                    sys.exit(1)
        else:
            for chunk in _chunks(queued, self.LOCK_CHUNK_SIZE):
                for i, p in self._run_chunk(chunk):
                    progress(i, p)

    # -- runtime.json ------------------------------------------------------
    _runtime_write_lock = threading.Lock()

    def _update_runtime_info(self, page_path, updates):
        # read-modify-write; the class-wide lock keeps concurrent
        # stages (PagePipeline overlap mode) from losing updates
        with Processor._runtime_write_lock:
            self._update_runtime_info_locked(page_path, updates)

    def _update_runtime_info_locked(self, page_path, updates):
        try:
            data_path = find_data_path(page_path)
            data_path.mkdir(exist_ok=True)
            json_path = data_path / Artifact.RUNTIME.filename()
            data = {}
            if json_path.exists():
                try:
                    data = json.loads(json_path.read_text())
                except json.JSONDecodeError:
                    data = {}
            for k, v in updates.items():
                if v is None:
                    data.pop(k, None)
                else:
                    data[k] = v
            tmp = json_path.parent / (json_path.stem + ".updated.json")
            tmp.write_text(json.dumps(data))
            os.replace(tmp, json_path)
        except Exception:
            logging.error(traceback.format_exc())


class BatchedProcessor(Processor):
    """Device-batched stage: collects ready pages and processes them in
    groups of `batch_size` through one jit graph.

    Locking happens per batch; failures are captured per page. Subclasses
    implement `process_batch(pages_kwargs)` where pages_kwargs is a list
    of (page_path, kwargs), and may override `preload(page_path)` —
    called on a background thread pool for the NEXT batch while the
    device computes the current one (the async host feeder replacing the
    reference's process pool; results arrive via kwargs['_preloaded'])."""

    def __init__(self, options=None, batch_size=8, preload_threads=4):
        super().__init__(options)
        self._batch_size = batch_size
        self._preload_threads = preload_threads

    def process_batch(self, pages):
        """Override: pages = [(path, kwargs)]. Return {path: info} or
        raise (whole batch recorded FAILED)."""
        raise NotImplementedError

    def preload(self, page_path):
        """Override: host-side IO for one page (decode, normalize)."""
        return None

    def process(self, page_path, **kwargs):
        # fallback: batch of one
        self.process_batch([(page_path, kwargs)])

    def _process_queue(self, queued):
        # device batching is single-host-process; the page-batch axis and
        # the mesh provide the parallelism, while a thread pool prefetches
        # the next batch's pages during device compute
        from concurrent.futures import ThreadPoolExecutor
        n = len(queued)
        if n == 0:
            if not self._plain:
                print("nothing to process.")
            return
        done = 0
        t0 = time.time()
        actor = "page" if self._lock_level == "PAGE" else self.processor_name
        chunks = list(_chunks(queued, self._batch_size))
        pool = ThreadPoolExecutor(max_workers=self._preload_threads)
        futures = {}

        def prefetch(chunk):
            for _, p, _kw in chunk:
                if p not in futures:
                    futures[p] = pool.submit(self.preload, p)

        if chunks:
            prefetch(chunks[0])
        for ci, chunk in enumerate(chunks):
            if ci + 1 < len(chunks):
                prefetch(chunks[ci + 1])
            for _, p, kw in chunk:
                f = futures.pop(p, None)
                if f is not None:
                    try:
                        kw["_preloaded"] = f.result()
                    except Exception:
                        kw["_preloaded"] = None
            self._run_batch_chunk(chunk, actor)
            done += len(chunk)
            if self._plain:
                for _, p, _kw in chunk:
                    print("[%d/%d] %s" % (done, n, p), flush=True)
            else:
                rate = done / max(time.time() - t0, 1e-6)
                print("\r[%d/%d] %.2f pages/s" % (done, n, rate),
                      end="" if done < n else "\n", flush=True)
        pool.shutdown(wait=False)

    def _run_batch_chunk(self, chunk, actor):
        with self._mutex.lock(actor,
                              [str(p) for _, p, _ in chunk]) as locked:
            if not locked:
                logging.warning(
                    "batch of %d pages is locked elsewhere; skipping "
                    "(stale locks? see utils.cleanup / --max-lock-age)",
                    len(chunk))
                return
            ready = [(p, kw) for _, p, kw in chunk
                     if all(f.is_ready() for f in kw.values()
                            if hasattr(f, "is_ready"))]
            if not ready:
                return
            for p, _kw in ready:
                find_data_path(p).mkdir(exist_ok=True)
            try:
                with elapsed_timer() as elapsed:
                    infos = self.process_batch(ready) or {}
                per_page = round(elapsed() / max(len(ready), 1), 2)
                for p, _kw in ready:
                    info = dict(infos.get(p, {}))
                    info.setdefault("status", "COMPLETED")
                    info["elapsed"] = per_page
                    self._update_runtime_info(
                        p, {self.processor_name: info})
            except KeyboardInterrupt:
                raise
            except Exception:
                logging.exception("batch failed")
                for p, _kw in ready:
                    self._update_runtime_info(
                        p, {self.processor_name: dict(
                            status="FAILED",
                            traceback=traceback.format_exc())})
