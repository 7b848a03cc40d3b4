"""Extraction-pipeline throughput bench (reference parity: upstream's
whole job is docs→pages/sec; it publishes no numbers, so this records
ours). Generates a synthetic corpus of multi-page documents, runs the
big-volume pipeline (dir scan → fused fan-out+features → gzip parquet
sink), and prints docs/s + pages/s.

Usage: python tools/bench_extract.py [--docs 2000] [--pages 10]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--pages", type=int, default=10)
    ap.add_argument("--words-per-page", type=int, default=120)
    args = ap.parse_args()

    from pdf2dataset_spark.extraction import ExtractionPipeline
    from pdf2dataset_spark.session import get_spark

    spark = get_spark("bench-extract")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="bench_extract_")
    try:
        src = os.path.join(root, "corpus")
        os.makedirs(src)
        page = " ".join(f"w{i}" for i in range(args.words_per_page))
        body = "\f".join(f"p{p} {page}" for p in range(args.pages)).encode()
        for d in range(args.docs):
            sub = os.path.join(src, f"s{d % 16:02d}")
            os.makedirs(sub, exist_ok=True)
            with open(os.path.join(sub, f"doc{d:06d}.pdf"), "wb") as f:
                f.write(b"doc-%06d\n" % d + body)

        out = os.path.join(root, "out.parquet")
        pipe = ExtractionPipeline(spark=spark, features=["text", "ocr"])
        t0 = time.perf_counter()
        pipe.run(src, out_path=out)
        elapsed = time.perf_counter() - t0
        n_pages = spark.read.parquet(out).count()
        print(
            {
                "docs": args.docs,
                "pages": n_pages,
                "elapsed_s": round(elapsed, 2),
                "docs_per_s": round(args.docs / elapsed, 1),
                "pages_per_s": round(n_pages / elapsed, 1),
                "features": ["text", "ocr"],
                "codec": "textbytes",
            }
        )

        # Phase 2: REAL PDFs through the minipdf parser — the
        # upstream-comparable number (pdftotext-style pages/s).
        from pdf2dataset_spark.sources.codecs import PdfCodec
        from pdf2dataset_spark.sources.minipdf import build_pdf

        src2 = os.path.join(root, "corpus_pdf")
        os.makedirs(src2)
        page_text = " ".join(f"w{i}" for i in range(args.words_per_page))
        pdf_body = build_pdf(
            [f"p{p} {page_text}" for p in range(args.pages)], compress=True
        )
        for d in range(args.docs):
            sub = os.path.join(src2, f"s{d % 16:02d}")
            os.makedirs(sub, exist_ok=True)
            with open(os.path.join(sub, f"doc{d:06d}.pdf"), "wb") as f:
                f.write(pdf_body)

        out2 = os.path.join(root, "out_pdf.parquet")
        pipe2 = ExtractionPipeline(
            spark=spark, features=["text"], codec=PdfCodec()
        )
        t0 = time.perf_counter()
        pipe2.run(src2, out_path=out2)
        elapsed = time.perf_counter() - t0
        n_pages2 = spark.read.parquet(out2).count()
        print(
            {
                "docs": args.docs,
                "pages": n_pages2,
                "elapsed_s": round(elapsed, 2),
                "docs_per_s": round(args.docs / elapsed, 1),
                "pages_per_s": round(n_pages2 / elapsed, 1),
                "features": ["text"],
                "codec": "pdf (minipdf, FlateDecode)",
            }
        )
        # Phase 3: ENCRYPTED PDFs (RC4-128 and AES-128) — quantifies
        # the Standard-security-handler decryption overhead on the
        # same corpus shape. R6/AES-256 is excluded: its per-FILE
        # Algorithm 2.B password hash (~0.2 s, by spec design) would
        # measure the KDF, not the pipeline.
        for rev, label in ((3, "rc4-128"), (4, "aes-128 /AESV2")):
            enc_body = build_pdf(
                [f"p{p} {page_text}" for p in range(args.pages)],
                compress=True,
                encrypt="",
                encrypt_rev=rev,
            )
            src3 = os.path.join(root, f"corpus_enc{rev}")
            os.makedirs(src3)
            for d in range(args.docs):
                sub = os.path.join(src3, f"s{d % 16:02d}")
                os.makedirs(sub, exist_ok=True)
                with open(os.path.join(sub, f"doc{d:06d}.pdf"), "wb") as f:
                    f.write(enc_body)
            out3 = os.path.join(root, f"out_enc{rev}.parquet")
            pipe3 = ExtractionPipeline(
                spark=spark, features=["text"], codec=PdfCodec()
            )
            t0 = time.perf_counter()
            pipe3.run(src3, out_path=out3)
            elapsed = time.perf_counter() - t0
            n_pages3 = spark.read.parquet(out3).count()
            print(
                {
                    "docs": args.docs,
                    "pages": n_pages3,
                    "elapsed_s": round(elapsed, 2),
                    "docs_per_s": round(args.docs / elapsed, 1),
                    "pages_per_s": round(n_pages3 / elapsed, 1),
                    "features": ["text"],
                    "codec": f"pdf encrypted ({label})",
                }
            )
        # Phase 4: SCANNED documents (no text layer, one embedded
        # image per page) through the scanned routing + in-repo
        # codec decode + grid OCR — the multimodal corpus shape.
        # Per-page decode is the bottleneck by design (pure-Python
        # entropy decoding); this records the honest pages/s for
        # each codec family at a small scan size.
        import numpy as np

        from pdf2dataset_spark.sources import ccitt, jbig2, raster
        from pdf2dataset_spark.sources.jpeg import encode_jpeg
        from pdf2dataset_spark.sources.jpx import encode_jpx

        sw, sh, spx = raster._rasterize("SCAN BENCH 99\nsecond line")
        spx = bytes(spx)
        bitmap = [
            bytearray(1 if spx[y * sw + x] < 128 else 0
                      for x in range(sw))
            for y in range(sh)
        ]
        # one page per doc: build_pdf attaches images to page 1, so
        # a multi-page doc would dilute pages/s with imageless pages
        scan_docs = args.docs // 5 or 1
        variants = {
            "jpeg-baseline": ("/DCTDecode",
                              encode_jpeg(sw, sh, spx, quality=90)),
            "ccitt-g4": ("/CCITTFaxDecode", ccitt.encode_g4(spx, sw, sh)),
            "jbig2-arith": ("/JBIG2Decode",
                            jbig2.encode_generic_page(bitmap)),
            "jbig2-huffman-mmr": ("/JBIG2Decode",
                                  jbig2.encode_huffman_text_page(
                                      [bitmap], [(0, 0, 0)], sw, sh,
                                      collective="mmr")[0]),
            "jpx-lossless": ("/JPXDecode",
                             encode_jpx(sw, sh, spx, 1, levels=3)),
            "jpx-lossy-97": ("/JPXDecode",
                             encode_jpx(sw, sh, spx, 1, levels=3,
                                        irreversible=True,
                                        quality_bits=10)),
        }
        for label, (filt, payload) in variants.items():
            entry = {"filter": filt, "width": sw, "height": sh,
                     "data": payload}
            if filt == "/JBIG2Decode":
                entry["bits"] = 1
            elif filt == "/CCITTFaxDecode":
                entry["bits"] = 1
                entry["decode_parms"] = {"/K": -1, "/Columns": sw,
                                         "/Rows": sh}
            scan_pdf = build_pdf([""], images=[entry])
            src4 = os.path.join(root, f"corpus_scan_{label}")
            os.makedirs(src4)
            for d in range(scan_docs):
                sub = os.path.join(src4, f"s{d % 16:02d}")
                os.makedirs(sub, exist_ok=True)
                with open(os.path.join(sub, f"doc{d:06d}.pdf"),
                          "wb") as f:
                    f.write(scan_pdf)
            out4 = os.path.join(root, f"out_scan_{label}.parquet")
            pipe4 = ExtractionPipeline(
                spark=spark, features=["text", "ocr", "image"],
                codec=PdfCodec(),
            )
            t0 = time.perf_counter()
            pipe4.run(src4, out_path=out4)
            elapsed = time.perf_counter() - t0
            df4 = spark.read.parquet(out4)
            n_pages4 = df4.count()
            from pyspark.sql import functions as F
            ocr_ok = df4.filter(
                F.col("ocr").contains("SCAN BENCH 99")
            ).count()
            print(
                {
                    "docs": scan_docs,
                    "pages": n_pages4,
                    "elapsed_s": round(elapsed, 2),
                    "pages_per_s": round(n_pages4 / elapsed, 1),
                    "ocr_recovered": f"{ocr_ok}/{n_pages4}",
                    "features": ["text", "ocr", "image"],
                    "codec": f"scanned ({label})",
                }
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
