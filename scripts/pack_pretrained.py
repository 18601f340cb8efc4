"""Pack trained production models into the checked-in pretrained dir.

`work/` is gitignored and the machine hosting the chip can be reset at
any time, so the distilled students + TPU-trained recognizer the bench
runs (bench.py `_find_trained_models`) must live in git. This script
re-encodes a bootstrap output at float16 (half the bytes, measured-
lossless for inference) into `models_pretrained/`:

    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/pack_pretrained.py --src work/bootstrap3

The result is a normal model tree loadable by models.registry (meta
"params_dtype" marks the storage dtype; load_model restores float32).
"""

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def repack(src, dst):
    from origami_tpu.models import registry
    model, params, meta = registry.load_model(src)
    registry.save_model(dst, meta, params, params_dtype="float16")
    print("packed %s -> %s (%.1f MB)" % (
        src, dst, (dst / "params.msgpack").stat().st_size / 1e6))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="work/bootstrap4")
    ap.add_argument("--dst", default="models_pretrained")
    args = ap.parse_args()
    src = Path(args.src)
    final = Path(args.dst)
    # build into a sibling temp dir and swap at the END: an interrupted
    # run must never leave the shipped pack half-deleted (a timed-out
    # pack once rmtree'd models_pretrained before writing anything)
    dst = final.parent / (final.name + ".packing")
    if dst.exists():
        shutil.rmtree(dst)
    for net in ("region", "separator"):
        s = src / "students" / net
        # SegmentationPredictor expects member SUBDIRS
        # (<group>/<k>/meta.json, core/predict.py); keep that layout
        if (s / "meta.json").exists():
            repack(s, dst / "students" / net / "00")
        else:
            for member in sorted(s.iterdir()):
                if (member / "meta.json").exists():
                    repack(member, dst / "students" / net / "00")
                    break
    repack(src / "recognizer", dst / "recognizer")
    # extra recognizer seeds (voting evaluation) ride along when present
    for extra in sorted(src.glob("recognizer[0-9]*")):
        if (extra / "meta.json").exists():
            repack(extra, dst / extra.name)
    if final.exists():
        shutil.rmtree(final)
    dst.rename(final)
    print("done: %s" % final)


if __name__ == "__main__":
    main()
