"""Multi-host integration: two real processes joined via
jax.distributed, hash-sharded page assignment, shared SQLite lock DB,
exactly-once artifacts (reference coordinates the same corpus traversal
through its lock DB alone, origami/batch/core/mutex.py:24-146)."""

import json
import os
import socket
import subprocess
import sys
import textwrap
import zipfile
from pathlib import Path

import numpy as np
import PIL.Image
import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from origami_tpu.batch.detect.segment import SegmentationProcessor
    proc = SegmentationProcessor("heuristic", dict(
        lock_strategy="DB", plain=True, processes=1))
    proc.traverse(sys.argv[1])
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_exactly_once(tmp_path):
    from origami_tpu.parallel.multihost import stable_shard

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    rng = np.random.default_rng(3)
    # choose page names whose hash assignment covers both shards
    names, shard_of = [], {}
    i = 0
    while len(set(shard_of.values())) < 2 or len(names) < 4:
        name = "page%03d.png" % i
        i += 1
        shard_of[name] = stable_shard(corpus / name, 2)
        names.append(name)
    for name in names:
        img = np.full((160, 120), 230, np.uint8)
        img[40:44, 10:110] = 20
        img += rng.integers(0, 8, img.shape).astype(np.uint8)
        PIL.Image.fromarray(img).save(str(corpus / name))

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            PYTHONPATH=str(REPO),
            JAX_PLATFORMS="cpu",
            ORIGAMI_TPU_PLATFORM="cpu",
            ORIGAMI_TPU_COORDINATOR="127.0.0.1:%d" % port,
            ORIGAMI_TPU_NUM_PROCESSES="2",
            ORIGAMI_TPU_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(corpus)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out, err)

    # both hosts got a non-empty, complementary assignment
    assigned = []
    for out, _ in outs:
        for line in out.splitlines():
            if "pages assigned" in line:
                assigned.append(int(line.split(": ")[1].split()[0]))
    assert len(assigned) == 2 and min(assigned) > 0
    assert sum(assigned) == len(names)

    # every page got exactly one valid segmentation artifact
    for name in names:
        seg = corpus / (Path(name).stem + ".out") / "segment.zip"
        assert seg.exists(), name
        with zipfile.ZipFile(seg) as zf:
            assert "regions.png" in zf.namelist()

    # and the host that produced it is the hash-assigned one: pages of
    # shard 0 must not appear in host 1's progress lines and vice versa
    for pid, (out, _) in enumerate(outs):
        done = [l.split()[-1] for l in out.splitlines()
                if l.startswith("[")]
        for page in done:
            assert shard_of[Path(page).name] == pid
