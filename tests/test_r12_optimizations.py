"""Focused tests for the round-12 optimization internals.

Round-12 turned the fused extraction pass into ``mapInArrow`` (the
output batch is assembled column-wise as Arrow arrays; no pandas
round-trip) and pinned the memory-source plan law the round-11
verdict asked for: an in-memory manifest must plan as
``LocalTableScan (+ Coalesce)``, never as a pickled
``Scan ExistingRDD``.
"""

from __future__ import annotations

import pytest

from pdf2dataset_spark.extraction import ExtractionPipeline, extract
from pdf2dataset_spark.sources.codecs import PdfCodec
from pdf2dataset_spark.sources.minipdf import build_pdf


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestArrowExtractionPass:
    """The fused fan-out runs as ONE MapInArrow node over the
    manifest — no pandas conversion node, no exchange, and the
    Arrow-shipped manifest plans as LocalTableScan."""

    def test_plan_shape(self, spark):
        pipe = ExtractionPipeline(
            spark=spark, features=["text"], codec=PdfCodec()
        )
        docs = {"a.pdf": build_pdf(["page one", "page two"])}
        plan = _plan(pipe.pages(docs))
        assert "MapInArrow" in plan
        assert "MapInPandas" not in plan
        assert "Exchange" not in plan
        # round-11 verdict item 6: the memory source must keep the
        # Arrow driver-ship path (LocalTableScan), not regress to a
        # pickled RDD scan
        assert "LocalTableScan" in plan
        assert "Scan ExistingRDD" not in plan

    def test_rows_and_error_capture(self, spark):
        docs = {
            "a.pdf": build_pdf(["alpha", "beta"]),
            "bad.pdf": b"\xff\xfenot a pdf",
        }
        pdf = extract(docs, spark=spark, small=True, use_pdf_codec=True)
        rows = {
            (r.path, r.page): (r.text, r.error)
            for r in spark.createDataFrame(pdf).collect()
        }
        assert rows[("a.pdf", 1)][0] == "alpha"
        assert rows[("a.pdf", 2)][0] == "beta"
        assert rows[("bad.pdf", -1)][0] is None
        assert "not a PDF" in rows[("bad.pdf", -1)][1]

    def test_typed_feature_columns_roundtrip(self, spark):
        """int32 / bool / float64 / binary feature values survive the
        Arrow batch assembly with their declared Spark types."""
        docs = {"a.pdf": build_pdf(["only page"])}
        df = ExtractionPipeline(
            spark=spark,
            features=[
                "text", "n_images", "is_tagged", "artifact_text_rate",
                "embedded_image",
            ],
            codec=PdfCodec(),
        ).pages(docs)
        fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert fields["n_images"] == "int"
        assert fields["is_tagged"] == "boolean"
        assert fields["artifact_text_rate"] == "double"
        assert fields["embedded_image"] == "binary"
        row = df.collect()[0]
        assert row.text == "only page"
        assert row.n_images == 0
        assert row.is_tagged is False
        assert row.embedded_image is None
        assert row.error is None

    def test_page_range_pushdown_still_prunes(self, spark):
        docs = {"a.pdf": build_pdf([f"p{i}" for i in range(1, 6)])}
        pipe = ExtractionPipeline(
            spark=spark, features=["text"], codec=PdfCodec()
        )
        got = sorted(
            r.page for r in pipe.pages(docs, page_range=(2, 4)).collect()
        )
        assert got == [2, 3, 4]
