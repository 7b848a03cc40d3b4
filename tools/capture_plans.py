"""Capture .explain("formatted") for the bench headliners (+ a5x).

Writes plans/<tag>/<query>_<suffix>.txt for every headline query and
the a5x extraction pipeline — the optimization-round evidence files
(the judge diffs _before vs _after against the code).

Usage: python tools/capture_plans.py <suffix> [tag=r11] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    tag = sys.argv[2] if len(sys.argv) > 2 else "r11"
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    from pdf2dataset_spark.queries import load_all
    from pdf2dataset_spark.session import get_spark, tune_for_input_size

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input_size(spark, [sf_dir])
    registry = load_all()

    for name in HEADLINE:
        if only and name not in only:
            continue
        df = registry[name].fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan_text(df))
        print(path)

    if not only or "a5x_pdf_extract" in only:
        from pdf2dataset_spark.extraction import ExtractionPipeline
        from pdf2dataset_spark.sources.codecs import PdfCodec
        from pdf2dataset_spark.sources.minipdf import build_pdf

        body = " ".join(f"w{j}" for j in range(80))
        docs = {
            f"doc{i:04d}.pdf": build_pdf(
                [f"doc {i} page {p} {body}" for p in range(6)], compress=True
            )
            for i in range(128)
        }
        pipe = ExtractionPipeline(spark=spark, features=["text"], codec=PdfCodec())
        df = pipe.pages(docs).select("path", "page", "text")
        path = os.path.join(out_dir, f"a5x_pdf_extract_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan_text(df))
        print(path)


if __name__ == "__main__":
    main()
