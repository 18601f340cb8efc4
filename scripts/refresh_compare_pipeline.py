"""Refresh COMPARE's pipeline rows from the SHIPPED models.

make_compare_report.py needs the full bootstrap work dir (ensembles +
report.json), which is not kept after pack_pretrained.py ships the
students/recognizers. This refresh re-runs only the chains the shipped
pack can drive — heuristic / student / student_voted — on the
deterministic val corpus (train/synth.py seed 7_000_000, the same
pages bootstrap_synth.py evaluates) and rewrites those rows plus the
loss-attribution tables in COMPARE_r05.md in place. The
trained_quality row (5-member ensembles) keeps its bootstrap-time
numbers.

Usage (runs on whatever backend is active; use the chip for s/page
parity with the bootstrap-time numbers):
    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/refresh_compare_pipeline.py
"""

import argparse
import collections
import json
import re
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/compare_refresh")
    ap.add_argument("--out", default="COMPARE_r05.md")
    ap.add_argument("--pages", type=int, default=4)
    ap.add_argument("--models", default="models_pretrained")
    args = ap.parse_args()

    from make_compare_report import (run_pipeline, pipeline_cer,
                                     composed_cer)
    import diagnose_pipeline as diag
    from origami_tpu.train import synth

    work = Path(args.work)
    models = Path(args.models).resolve()
    val = work / "val"
    if not (val / "synth0000.gt.json").exists():
        synth.write_corpus(val, 12, seed=7_000_000)
    for extra in val.glob("*.labels.*.png"):
        extra.unlink()

    members = [models / "recognizer", models / "recognizer2",
               models / "recognizer3"]
    members = [m for m in members if (m / "meta.json").exists()]
    vote_dir = work / "recognizers_voted"
    if len(members) >= 2:
        if vote_dir.exists():
            shutil.rmtree(vote_dir)
        vote_dir.mkdir(parents=True)
        for i, src in enumerate(members):
            (vote_dir / str(i)).symlink_to(src.resolve())

    chains = [
        ("heuristic", "heuristic", "quality", models / "recognizer"),
        ("student", models / "students", "speed",
         models / "recognizer"),
    ]
    if vote_dir.exists():
        chains.append(("student_voted", models / "students", "speed",
                       vote_dir))

    results = {}
    for label, model, target, rec in chains:
        corpus = work / ("pipeline_" + label)
        if corpus.exists():
            shutil.rmtree(corpus)
        corpus.mkdir(parents=True)
        val_pages = [p for p in sorted(val.glob("*.png"))
                     if ".labels." not in p.name]
        for img in val_pages[: args.pages]:
            shutil.copy(img, corpus / img.name)
        elapsed = run_pipeline(corpus, str(model), rec, target=target,
                               warm_ocr=True)
        results[label] = dict(
            cer=pipeline_cer(corpus, val),
            composed_cer=composed_cer(corpus, val),
            seconds_per_page=round(elapsed / args.pages, 2))
        print(label, json.dumps(results[label]))

    # -- patch COMPARE in place -------------------------------------
    out_path = Path(args.out)
    text = out_path.read_text()
    for label, r in results.items():
        c = r["cer"]
        row = "| %s | %.3f | %.4f | %.4f | %.4f | %.4f | %.1f%% | %.1f |" % (
            label, c["line_recall"], c["cer"], c["cer_median"],
            r["composed_cer"], c["order_free_cer"],
            100 * c.get("spurious_chars_frac", 0.0),
            r["seconds_per_page"])
        text, n = re.subn(r"^\| %s \|.*$" % re.escape(label), row,
                          text, count=1, flags=re.M)
        if not n:
            print("WARNING: no existing row for", label)

    for chain in ("student", "student_voted"):
        cats = collections.Counter()
        corpus = work / ("pipeline_" + chain)
        for img in sorted(corpus.glob("*.png")):
            gt_path = val / (img.stem + ".gt.json")
            if ".labels." in img.name or not gt_path.exists():
                continue
            if not (img.parent / (img.stem + ".out") /
                    "ocr.zip").exists():
                continue
            for row in diag.diagnose_page(
                    img, json.loads(gt_path.read_text())):
                cats[row["cat"]] += 1
        total = sum(cats.values())
        if not total:
            continue
        table = ["| category | lines | % |", "|---|---|---|"]
        table += ["| %s | %d | %.1f |" % (cat, n, 100.0 * n / total)
                  for cat, n in cats.most_common()]
        pat = (r"(## Pipeline loss attribution \(%s chain\)\n\n)"
               r"\| category.*?(?=\n\n|\Z)" % re.escape(chain))
        text, n = re.subn(pat, lambda m: m.group(1) + "\n".join(table),
                          text, count=1, flags=re.S)
        if not n:
            print("WARNING: no attribution section for", chain)

    marker = ("Pipeline rows for heuristic/student/student_voted "
              "refreshed from the shipped models_pretrained pack "
              "(scripts/refresh_compare_pipeline.py) after the "
              "reading-order scorer fix; trained_quality keeps its "
              "bootstrap-time numbers.")
    if marker not in text:
        text = text.replace(
            "## Full pipeline on val pages (segment -> compose)\n",
            "## Full pipeline on val pages (segment -> compose)\n\n"
            + marker + "\n", 1)
    out_path.write_text(text)
    print("patched", out_path)


if __name__ == "__main__":
    main()
