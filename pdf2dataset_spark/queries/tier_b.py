"""Tier B — projection / filter / scalar expressions (SURVEY.md §2).

Every operator here is a Catalyst built-in: predicates push into the
parquet scan (PushedFilters), projections prune columns (ReadSchema),
and all expressions stay inside whole-stage codegen — zero Python in
the hot path. Cross-engine float discipline (verified empirically at
sf0.01): exp/sqrt/pow/percentile are bitwise-identical between Spark
and DuckDB on this machine; ln and round(double) are NOT and are kept
out of hash-checked outputs; money math uses lossless decimal casts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf2dataset_spark.queries import query
from pdf2dataset_spark.queries._util import dec, t


# --------------------------------------------------------------- B1
@query(
    "b1_project_compute",
    sql="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    """,
    tier="B",
)
def b1_project_compute(spark, sf_dir):
    """Projection + computed column + rename (B1)."""
    li = t(spark, sf_dir, "lineitem")
    revenue = (dec("l_extendedprice") * (1 - dec("l_discount", 4))).cast("double")
    return li.select("l_orderkey", "l_linenumber", revenue.alias("revenue"))


# --------------------------------------------------------------- B2
@query(
    "b2_filter_range",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount BETWEEN 0.05 AND 0.07
      AND NOT (l_returnflag = 'A')
    """,
    tier="B",
)
def b2_filter_range(spark, sf_dir):
    """Comparison + BETWEEN + boolean logic filters, pushed to scan (B2)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & F.col("l_discount").between(0.05, 0.07)
        & ~(F.col("l_returnflag") == "A")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


# --------------------------------------------------------------- B3
@query(
    "b3_in_list",
    sql="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus NOT IN ('P')
    """,
    tier="B",
)
def b3_in_list(spark, sf_dir):
    """IN / NOT IN list predicates (B3)."""
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ~F.col("o_orderstatus").isin("P")
    ).select("o_orderkey", "o_orderpriority")


# --------------------------------------------------------------- B4
@query(
    "b4_like_regex",
    sql="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%widget%' OR regexp_matches(p_type, '^(ECONOMY|PROMO)$')
    """,
    tier="B",
)
def b4_like_regex(spark, sf_dir):
    """LIKE and regex predicates (B4)."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%widget%")
        | F.col("p_type").rlike("^(ECONOMY|PROMO)$")
    ).select("p_partkey", "p_name", "p_type")


# --------------------------------------------------------------- B5
@query(
    "b5_null_handling",
    sql="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_flag,
           (NULLIF(l_discount, 0.0) IS NULL) AS was_zero,
           (l_discount IS NOT NULL) AS never_null
    FROM lineitem
    """,
    tier="B",
)
def b5_null_handling(spark, sf_dir):
    """NULL handling: nullif / coalesce / is-null predicates (B5)."""
    li = t(spark, sf_dir, "lineitem")
    nz = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(nz, F.lit(-1.0)).alias("disc_or_flag"),
        nz.isNull().alias("was_zero"),
        F.col("l_discount").isNotNull().alias("never_null"),
    )


# --------------------------------------------------------------- B6
@query(
    "b6_case_when",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band
    FROM orders
    """,
    tier="B",
)
def b6_case_when(spark, sf_dir):
    """Conditional expressions (B6)."""
    o = t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    return o.select("o_orderkey", band.alias("price_band"))


# --------------------------------------------------------------- B7
@query(
    "b7_cast",
    sql="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INTEGER) AS qty_int,
           CAST(l_linenumber AS BIGINT) AS line_big,
           CAST(l_returnflag = 'A' AS INTEGER) AS flag_int,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str
    FROM lineitem
    """,
    tier="B",
)
def b7_cast(spark, sf_dir):
    """Cast / type coercion across numeric, boolean, date, string (B7)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("bigint").alias("line_big"),
        (F.col("l_returnflag") == "A").cast("int").alias("flag_int"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_str"),
    )


# --------------------------------------------------------------- B8
@query(
    "b8_string_functions",
    sql="""
    SELECT c_custkey,
           length(c_name) AS name_len,
           lower(c_name) AS lowered,
           upper(c_mktsegment) AS seg_up,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           substring(c_name, 1, 8) AS prefix,
           concat_ws('|', c_mktsegment, c_name) AS joined,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS extracted_id,
           regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nat_padded,
           instr(c_name, '#') AS hash_pos,
           levenshtein(c_mktsegment, 'BUILDING') AS lev_build
    FROM customer
    """,
    tier="B",
)
def b8_string_functions(spark, sf_dir):
    """String function battery (B8)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.length("c_name").alias("name_len"),
        F.lower("c_name").alias("lowered"),
        F.upper("c_mktsegment").alias("seg_up"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.regexp_extract("c_name", "([0-9]+)", 1).cast("bigint").alias("extracted_id"),
        F.regexp_replace("c_name", "0+", "0").alias("squeezed"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nat_padded"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_build"),
    )


# --------------------------------------------------------------- B9
@query(
    "b9_datetime_functions",
    sql="""
    SELECT o_orderkey,
           year(o_orderdate) AS o_year,
           month(o_orderdate) AS o_month,
           day(o_orderdate) AS o_day,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           CAST(o_orderdate AS DATE) + 30 AS plus_30,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
    FROM orders
    """,
    tier="B",
)
def b9_datetime_functions(spark, sf_dir):
    """Date/time function battery on NTZ timestamps (B9)."""
    o = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("o_year"),
        F.month(od).alias("o_month"),
        F.dayofmonth(od).alias("o_day"),
        F.date_trunc("month", od).cast("date").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), od.cast("date")).alias(
            "days_to_2002"
        ),
        F.date_add(od.cast("date"), 30).alias("plus_30"),
        F.unix_timestamp(od.cast("timestamp")).alias("epoch_s"),
    )


# --------------------------------------------------------------- B10
@query(
    "b10_math_functions",
    sql="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS qty_dev,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           sqrt(l_quantity) AS qty_sqrt,
           exp(l_discount) AS disc_exp,
           pow(l_quantity, 2.0) AS qty_sq,
           CAST(((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS BIGINT) AS key_pmod,
           CAST(sign(l_quantity - 25) AS INTEGER) AS dev_sign
    FROM lineitem
    """,
    tier="B",
)
def b10_math_functions(spark, sf_dir):
    """Math battery; only cross-engine-bitwise fns in output (B10).

    ln/round(double) excluded — verified NOT bitwise-stable between
    JVM Math and libm on this data.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.exp("l_discount").alias("disc_exp"),
        F.pow("l_quantity", F.lit(2.0)).alias("qty_sq"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_pmod"),
        F.signum(F.col("l_quantity") - 25).cast("int").alias("dev_sign"),
    )


# --------------------------------------------------------------- B11
@query(
    "b11_hashing",
    sql="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           md5(concat_ws('|', c_name, c_mktsegment)) AS row_md5
    FROM customer
    """,
    tier="B",
)
def b11_hashing(spark, sf_dir):
    """Hash functions for dedup keys / fingerprints (B11).

    Spark-only xxhash64/crc32/hash have no DuckDB twins; they are
    exercised in f-tier fingerprints' rows-only checks instead.
    """
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.md5(F.concat_ws("|", "c_name", "c_mktsegment")).alias("row_md5"),
    )


# --------------------------------------------------------------- B12
@query(
    "b12_array_functions",
    sql="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(list_aggregate(embedding, 'sum') AS DOUBLE) AS vec_sum,
           CAST(list_aggregate(list_transform(embedding[1:8], x -> x * 2.0),
                               'sum') AS DOUBLE) AS head8_doubled_sum,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           (len(list_filter(embedding, x -> x > 0.5)) > 0) AS any_gt_half
    FROM embeddings
    """,
    tier="B",
)
def b12_array_functions(spark, sf_dir):
    """Array + higher-order functions over 64-dim embeddings (B12).

    Sequential list sums verified bitwise-identical across engines.
    """
    e = t(spark, sf_dir, "embeddings")
    acc = lambda a, x: a + x  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.aggregate("embedding", F.lit(0.0), acc).alias("vec_sum"),
        F.aggregate(
            F.transform(F.slice("embedding", 1, 8), lambda x: x * F.lit(2.0)),
            F.lit(0.0),
            acc,
        ).alias("head8_doubled_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.exists("embedding", lambda x: x > F.lit(0.5)).alias("any_gt_half"),
    )


# --------------------------------------------------------------- B13
@query(
    "b13_map_functions",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys
    FROM events
    """,
    tier="B",
)
def b13_map_functions(spark, sf_dir):
    """JSON → MapType → map functions (B13)."""
    e = t(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    )


# --------------------------------------------------------------- B14
@query(
    "b14_json_functions",
    sql="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS absent
    FROM events
    """,
    tier="B",
)
def b14_json_functions(spark, sf_dir):
    """JSON string functions (B14)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
        F.get_json_object("props", "$.missing").cast("bigint").alias("absent"),
    )


# --------------------------------------------------------------- B15
@query(
    "b15_explode_tokens",
    sql="""
    SELECT doc_id, pos, string_split(text, ' ')[pos] AS word
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
    )
    """,
    tier="B",
)
def b15_explode_tokens(spark, sf_dir):
    """posexplode(split(text)) → (doc_id, pos, word) rows (B15)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).cast("bigint").alias("pos"), "word")


# --------------------------------------------------------------- B16
@query(
    "b16_struct_array_json_misc",
    sql="""
    SELECT event_id,
           to_json(json_object('id', event_id, 'type', event_type)) AS as_json,
           array_to_string(['a', event_type, 'z'], '|') AS arr_join,
           CAST(len(flatten([[1, 2], [3]])) AS INTEGER) AS flat_len,
           CAST(list_aggregate([event_id % 10, 2, 3], 'max') AS BIGINT) AS arr_max,
           array_to_string(list_reverse(['x', event_type]), '-') AS rev_join
    FROM events
    """,
    tier="B",
)
def b16_struct_array_json_misc(spark, sf_dir):
    """Remaining B-tier surface: to_json over a struct, array joins,
    flatten, array_max, reverse (B12-B14 stragglers)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("type"))
        ).alias("as_json"),
        F.concat_ws("|", F.array(F.lit("a"), F.col("event_type"), F.lit("z"))).alias(
            "arr_join"
        ),
        F.size(
            F.flatten(F.array(F.array(F.lit(1), F.lit(2)), F.array(F.lit(3))))
        ).alias("flat_len"),
        F.array_max(
            F.array(F.col("event_id") % 10, F.lit(2).cast("bigint"), F.lit(3).cast("bigint"))
        ).alias("arr_max"),
        F.concat_ws("-", F.reverse(F.array(F.lit("x"), F.col("event_type")))).alias(
            "rev_join"
        ),
    )


# --------------------------------------------------------------- B17
@query(
    "b17_json_tuple_map_entries",
    sql="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k1,
           json_extract_string(props, '$.nope') AS k2,
           CAST(event_id % 7 AS BIGINT) AS from_map,
           array_to_string([CAST(event_id AS VARCHAR), event_type], ':') AS zipped
    FROM events
    """,
    tier="B",
)
def b17_json_tuple_map_entries(spark, sf_dir):
    """B13/B14 stragglers: json_tuple multi-extract, map_from_entries
    + element_at, arrays_zip (serialized — struct cells are
    comparator-hostile)."""
    e = t(spark, sf_dir, "events")
    jt = F.json_tuple(F.col("props"), "k", "nope")
    m = F.map_from_entries(
        F.array(F.struct(F.lit("k").alias("key"), (F.col("event_id") % 7).alias("value")))
    )
    zipped = F.arrays_zip(
        F.array(F.col("event_id").cast("string")), F.array(F.col("event_type"))
    )
    return e.select(
        "event_id",
        jt,
        F.element_at(m, "k").alias("from_map"),
        F.concat_ws(
            ":",
            F.flatten(
                F.transform(zipped, lambda s: F.array(s["0"], s["1"]))
            ),
        ).alias("zipped"),
    ).withColumnsRenamed({"c0": "k1", "c1": "k2"})


# --------------------------------------------------------------- B17
@query(
    "b17_bitwise",
    sql="""
    SELECT l_returnflag,
           bit_and(l_orderkey) AS k_and,
           bit_or(l_orderkey) AS k_or,
           bit_xor(l_orderkey) AS k_xor,
           bit_and(l_orderkey & 255) AS low_and,
           bit_or(l_orderkey << 1 >> 2) AS shifted_or
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tier="B",
)
def b17_bitwise(spark, sf_dir):
    """Bitwise scalar (&, <<, >>) and aggregate (bit_and/or/xor)
    surface. All pure integer lattice operations — associative and
    commutative, so partial aggregation composes in any order on any
    cluster width (the same safety argument as the cents sums,
    exactly)."""
    li = t(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and(k).alias("k_and"),
            F.bit_or(k).alias("k_or"),
            F.bit_xor(k).alias("k_xor"),
            F.bit_and(k.bitwiseAND(F.lit(255))).alias("low_and"),
            F.bit_or(F.shiftright(F.shiftleft(k, 1), 2)).alias("shifted_or"),
        )
        .orderBy("l_returnflag")
    )
