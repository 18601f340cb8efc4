"""utils.pdf — convert PDFs into page images.

Reference contract: origami/batch/utils/pdf.py (pdf2image conversion).
pdf2image/poppler is not part of this image; PyMuPDF is attempted, and a
clear error is raised if no backend is available.
"""

from __future__ import annotations

from pathlib import Path

import click


def convert_pdf(pdf_path, out_dir, dpi=300):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    try:
        import fitz  # PyMuPDF
    except ImportError:
        raise click.UsageError(
            "no PDF backend available (PyMuPDF not installed); convert "
            "PDFs to page images externally")
    doc = fitz.open(str(pdf_path))
    n = 0
    for i, page in enumerate(doc):
        pix = page.get_pixmap(dpi=dpi)
        pix.save(str(out_dir / ("%s-%04d.png"
                                % (Path(pdf_path).stem, i + 1))))
        n += 1
    return n


@click.command()
@click.argument("pdf_path", type=click.Path(exists=True), required=True)
@click.option("-o", "--output", type=click.Path(), required=True)
@click.option("--dpi", type=int, default=300)
def pdf(pdf_path, output, dpi):
    """Convert PDF_PATH into page images under OUTPUT."""
    n = convert_pdf(pdf_path, output, dpi)
    print("wrote %d pages." % n)


if __name__ == "__main__":
    pdf()
