"""CLI entry point — upstream-compatible surface (SURVEY §3.1 EP1).

Upstream: ``pdf2dataset INPUT_DIR OUT.parquet.gzip [--num-cpus N]
[--ocr true] [--lang L] [--features text,image] [--small]``.

Spark-native mapping: ``python -m pdf2dataset_spark INPUT OUT
[--num-cpus N] [--ocr] [--lang L] [--features text,image] [--small]``
— num-cpus sizes the local master and shuffle partitions; a cluster
deployment passes --master instead (upstream's ray-address analog).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pdf2dataset_spark",
        description="Extract a page-grain dataset from a document tree.",
    )
    p.add_argument("input_dir", help="root directory of input documents")
    p.add_argument(
        "out_path",
        nargs="?",
        default=None,
        help="output parquet path (omit with --small to print instead)",
    )
    p.add_argument("--features", default="text", help="comma-separated feature names")
    p.add_argument("--ocr", action="store_true", help="add the OCR feature")
    p.add_argument("--lang", default="eng", help="OCR language")
    p.add_argument("--num-cpus", type=int, default=None, help="local parallelism")
    p.add_argument("--master", default=None, help="Spark master URL (cluster mode)")
    p.add_argument("--glob", default="*.pdf", help="input filename glob")
    p.add_argument(
        "--small",
        action="store_true",
        help="collect to a pandas DataFrame and print (upstream small mode)",
    )
    p.add_argument(
        "--use-pdf-codec",
        action="store_true",
        help="bind the real PDF codec (pure-Python text/render/OCR; "
        "non-png rendering needs poppler-family libs)",
    )
    p.add_argument(
        "--image-format", default=None, help="rendered page image format (jpeg/png)"
    )
    p.add_argument(
        "--image-size", default=None, help="resize rendered page images, 'WxH'"
    )
    p.add_argument(
        "--password",
        default="",
        help="password for encrypted PDFs (user or owner; encrypted "
        "files with an empty user password open without it)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.small and args.out_path is None:
        build_parser().error("out_path is required unless --small")

    from pdf2dataset_spark.extraction import ExtractionPipeline
    from pdf2dataset_spark.session import get_spark
    from pdf2dataset_spark.sources.codecs import PdfCodec, TextBytesCodec

    master = args.master or (f"local[{args.num_cpus}]" if args.num_cpus else None)
    spark = get_spark(
        "pdf2dataset-spark-cli", master=master, shuffle_partitions=args.num_cpus
    )
    feats = [f.strip() for f in args.features.split(",") if f.strip()]
    if args.ocr and "ocr" not in feats:
        feats.append("ocr")
    pipe = ExtractionPipeline(
        spark=spark,
        features=feats,
        codec=PdfCodec(
            ocr_lang=args.lang,
            image_format=args.image_format or "png",
            image_size=args.image_size,
            password=args.password,
        )
        if args.use_pdf_codec
        else (
            TextBytesCodec(
                image_format=args.image_format, image_size=args.image_size
            )
            if (args.image_format or args.image_size)
            else None
        ),
        glob=args.glob,
    )
    if args.small:
        df = pipe.run(args.input_dir, small=True)
        print(df.to_string())
    else:
        pipe.run(args.input_dir, out_path=args.out_path)
        n = spark.read.parquet(args.out_path).count()
        print(f"wrote {n} page rows to {args.out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
