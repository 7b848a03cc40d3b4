"""Declared-schema contract (SURVEY §1.2): the explicit StructTypes
in schemas.py must match what the engine actually loads — the
assertion io.py's no-inference policy leans on."""

from __future__ import annotations

import pytest

from pdf2dataset_spark.io import TABLES, load_table
from pdf2dataset_spark.schemas import TABLE_SCHEMAS, spark_type_for

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", TABLES)
def test_declared_schema_matches_loaded(spark, name):
    got = load_table(spark, SF, name).schema
    want = TABLE_SCHEMAS[name]
    assert [f.name for f in got.fields] == [f.name for f in want.fields]
    for gf, wf in zip(got.fields, want.fields):
        assert gf.dataType == wf.dataType, (
            f"{name}.{gf.name}: loaded {gf.dataType} != declared {wf.dataType}"
        )


def test_pyarrow_type_map_round_trip():
    assert spark_type_for("string").typeName() == "string"
    assert spark_type_for("int16").typeName() == "short"
    assert spark_type_for("binary").typeName() == "binary"
    assert spark_type_for("bool_").typeName() == "boolean"
    with pytest.raises(ValueError, match="unsupported pyarrow type"):
        spark_type_for("no_such_type")
