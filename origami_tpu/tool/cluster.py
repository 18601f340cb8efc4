"""Corpus layout clustering over page signatures.

Counterpart of the reference's PySide2 cluster explorer
(origami/tool/cluster.py) as a CLI: k-means over the grid-count
signatures written by utils.signature, printing/exporting cluster
membership for corpus QA.
"""

from __future__ import annotations

import json
import zipfile
from pathlib import Path

import click
import numpy as np

from origami_tpu.tool.split import kmeans


def load_signatures(data_path):
    names, feats = [], []
    for sig_path in sorted(Path(data_path).glob("**/signature.zip")):
        try:
            with zipfile.ZipFile(sig_path) as zf:
                data = json.loads(zf.read("signature.json"))
        except (zipfile.BadZipFile, KeyError):
            continue
        counts = data.get("counts", {})
        if not counts:
            continue
        vec = np.concatenate([np.asarray(v, dtype=np.float64)
                              for _, v in sorted(counts.items())])
        names.append(str(sig_path.parent))
        feats.append(vec)
    if not feats:
        return [], np.zeros((0, 0))
    width = max(len(v) for v in feats)
    mat = np.zeros((len(feats), width))
    for i, v in enumerate(feats):
        mat[i, : len(v)] = v
        n = np.linalg.norm(mat[i])
        if n > 0:
            mat[i] /= n
    return names, mat


@click.command()
@click.argument("data_path", type=click.Path(exists=True), required=True)
@click.option("-k", type=int, default=8)
@click.option("-o", "--output", type=click.Path(), default=None,
              help="write cluster membership JSON here")
def cluster(data_path, k, output):
    """Cluster page layouts in DATA_PATH by signature."""
    names, mat = load_signatures(data_path)
    if not names:
        print("no signatures found (run batch.utils.signature first).")
        return
    assign, _ = kmeans(mat, k)
    groups = {}
    for name, a in zip(names, assign):
        groups.setdefault(int(a), []).append(name)
    for gid, members in sorted(groups.items()):
        print("cluster %d (%d pages):" % (gid, len(members)))
        for m in members[:5]:
            print("   %s" % m)
        if len(members) > 5:
            print("   ...")
    if output:
        Path(output).write_text(json.dumps(
            {str(k): v for k, v in groups.items()}, indent=2))


if __name__ == "__main__":
    cluster()
