"""Scalar function surface: string / regex / date / math / decimal /
array / map / json / null handling (SURVEY §2B).

Anchor: the reference's page codec round-trips int32 / float / double /
length-prefixed bytes / ASCII strings (page.clj:16-38, US_ASCII pinned
at page.clj:6) — its entire "type system". Here the full Spark scalar
function library replaces offset-addressed codecs; everything below is
whole-stage-codegen'd JVM expressions (no Python in the hot path).

Numeric note: functions whose result is a fresh IEEE op on identical
inputs (abs/pow/sqrt/ln/floor/ceil/mod) hash-match the oracle exactly;
`round` is applied to quotients whose binary expansion never sits on a
decimal boundary at the rounded scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from opusdb_spark.registry import register
from opusdb_spark.tables import table


@register(
    "fn_string",
    oracle="""
        SELECT p_partkey,
               upper(p_name) AS uname,
               lower(p_type) AS ltype,
               substring(p_name, 1, 5) AS name5,
               trim(concat(' ', p_name, ' ')) AS trimmed,
               length(p_name) AS name_len,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
               concat(p_brand, ':', p_type) AS brand_type
        FROM part
    """,
    tags=("function", "string"),
)
def fn_string(spark, sf_dir):
    """String kernel: substring/upper/lower/trim/concat/length/lpad
    (string codec anchor, page.clj:31-38)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_type").alias("ltype"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
    )


@register(
    "fn_regex",
    oracle=r"""
        SELECT p_partkey, p_brand,
               regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
               CASE WHEN regexp_matches(p_name, '^(red|blue|green)') THEN 1 ELSE 0 END
                   AS is_color_first
        FROM part
    """,
    tags=("function", "regex"),
)
def fn_regex(spark, sf_dir):
    """regexp extract / replace / match on brand codes and names."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.when(F.col("p_name").rlike("^(red|blue|green)"), 1)
        .otherwise(0)
        .alias("is_color_first"),
    )


@register(
    "fn_date",
    oracle="""
        SELECT o_orderkey,
               year(o_orderdate) AS o_year,
               month(o_orderdate) AS o_month,
               date_trunc('month', o_orderdate) AS month_start,
               date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
               CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus3m,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
        FROM orders
    """,
    tags=("function", "date"),
)
def fn_date(spark, sf_dir):
    """year/month/date_trunc/datediff/add_months/last_day."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_epoch_start"),
        F.add_months(F.col("o_orderdate").cast("date"), 3)
        .cast("timestamp_ntz")
        .alias("plus3m"),
        F.last_day(F.col("o_orderdate").cast("date"))
        .cast("timestamp_ntz")
        .alias("month_end"),
    )


@register(
    "fn_math",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_extendedprice - 1000.0) AS abs_diff,
               round(l_extendedprice / 3.0, 2) AS third_rounded,
               pow(l_discount, 2) AS disc_sq,
               sqrt(l_extendedprice) AS price_sqrt,
               round(ln(l_extendedprice), 6) AS price_ln,
               CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_floor,
               CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil,
               l_orderkey % 97 AS key_mod
        FROM lineitem
    """,
    tags=("function", "math"),
)
def fn_math(spark, sf_dir):
    """round/abs/pow/sqrt/ln/floor/ceil/mod — all fresh IEEE ops on
    identical inputs, so bit-identical to the oracle."""
    lt = table(spark, sf_dir, "lineitem")
    return lt.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_diff"),
        F.round(F.col("l_extendedprice") / 3.0, 2).alias("third_rounded"),
        F.pow("l_discount", F.lit(2)).alias("disc_sq"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        # JVM log and C libm log differ by 1 ulp on ~1% of inputs; round
        # to 6 dp so both engines land on the same grid point.
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.floor(F.col("l_quantity") / 7.0).alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
    )


@register(
    "fn_cast_decimal",
    oracle="""
        SELECT o_orderstatus,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS exact_total,
               CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
               CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("function", "decimal"),
)
def fn_cast_decimal(spark, sf_dir):
    """Exact DECIMAL(12,2) money totals (the exact-types obligation the
    reference meets with int pages + conservation checks). The
    aggregation is exact in decimal; the FINAL projection casts to
    double (exactly representable here) because decimal output cells
    surface as Python Decimal objects in pandas while the oracle's
    surface as float64 — a guaranteed canonical-hash mismatch."""
    o = table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast(DecimalType(12, 2))
    return o.groupBy("o_orderstatus").agg(
        F.sum(dec).cast("double").alias("exact_total"),
        F.min(dec).cast("double").alias("min_price"),
        F.max(dec).cast("double").alias("max_price"),
    )


@register(
    "fn_array",
    oracle="""
        SELECT p_partkey,
               array_to_string(string_split(p_name, ' '), ',') AS words,
               len(string_split(p_name, ' ')) AS n_words,
               list_contains(string_split(p_name, ' '), 'red') AS has_red
        FROM part
    """,
    tags=("function", "array"),
)
def fn_array(spark, sf_dir):
    """split/size/array_contains over p_name word lists.

    The word list is emitted as a comma-joined string so that row
    canonicalizers based on pandas sort/hash (which can't factorize
    ndarray cells) can compare it.
    """
    p = table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.array_join(words, ",").alias("words"),
        F.size(words).alias("n_words"),
        F.array_contains(words, "red").alias("has_red"),
    )


@register(
    "fn_array_explode",
    oracle="""
        SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
        FROM part
    """,
    tags=("function", "array"),
)
def fn_array_explode(spark, sf_dir):
    """explode() generator: one row per word of p_name."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.explode(F.split(F.col("p_name"), " ")).alias("word")
    )


@register(
    "fn_map",
    oracle="""
        SELECT event_id,
               'type=' || event_type || ';user=' || CAST(user_id AS VARCHAR)
                   AS props_rendered,
               event_type AS type_val,
               user_id AS user_val
        FROM events
    """,
    tags=("function", "map"),
)
def fn_map(spark, sf_dir):
    """str_to_map over a derived "k1:v1,k2:v2" properties string, then
    typed key extraction — the dynamic-schema escape hatch (the
    reference's refs are schemaless, stm.clj holds any value). The map
    itself is rendered to a canonical sorted "k=v;…" string so the
    result is hashable and oracle-comparable (map cells are not)."""
    ev = table(spark, sf_dir, "events")
    props_kv = F.concat(
        F.lit("type:"), F.col("event_type"), F.lit(",user:"), F.col("user_id")
    )
    m = F.str_to_map(props_kv, F.lit(","), F.lit(":"))
    rendered = F.array_join(
        F.transform(
            F.array_sort(F.map_entries(m)),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
        ";",
    )
    return ev.select(
        "event_id",
        rendered.alias("props_rendered"),
        m.getItem("type").alias("type_val"),
        m.getItem("user").cast("long").alias("user_val"),
    )


@register(
    "fn_json",
    oracle="""
        SELECT event_id, props,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        FROM events
    """,
    tags=("function", "json"),
)
def fn_json(spark, sf_dir):
    """get_json_object over the events.props JSON column."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "props",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
    )


@register(
    "fn_variant",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k')
                             AS BIGINT)) AS BIGINT) AS sum_k,
               'OBJECT<k: BIGINT>' AS variant_schema,
               CAST(COUNT(*) AS BIGINT) AS n_missing_null
        FROM events GROUP BY 1 ORDER BY 1
    """,
    tags=("function", "json", "variant"),
)
def fn_variant(spark, sf_dir):
    """The VARIANT semi-structured type (Spark 4): props parses ONCE
    into the binary variant encoding, then typed paths extract without
    re-parsing JSON text per access — at 100 TB the difference between
    one parse and one per downstream expression. Pins typed
    variant_get extraction (summable bigint straight out of the
    variant), schema_of_variant inference (the oracle hard-codes the
    expected 'OBJECT<k: BIGINT>' — a drift in Spark's inference
    surfaces as a hash mismatch), and try_variant_get's NULL-not-error
    contract on a missing path."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.variant_get("v", "$.k", "bigint")).alias("sum_k"),
            F.min(F.schema_of_variant("v")).alias("variant_schema"),
            F.sum(
                F.when(
                    F.try_variant_get("v", "$.missing", "string").isNull(),
                    1,
                ).otherwise(0)
            ).alias("n_missing_null"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_null",
    oracle="""
        SELECT c_custkey,
               nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
               coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_defaulted,
               CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
                    THEN 'present' ELSE 'absent' END AS nvl2_shape
        FROM customer
    """,
    tags=("function", "null"),
)
def fn_null(spark, sf_dir):
    """coalesce / nullif / nvl2-shaped null logic."""
    c = table(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        F.coalesce(seg_or_null, F.lit("DEFAULT")).alias("seg_defaulted"),
        F.when(seg_or_null.isNotNull(), "present")
        .otherwise("absent")
        .alias("nvl2_shape"),
    )


@register(
    "fn_bitwise",
    oracle="""
        SELECT event_id,
               event_id & 255 AS low_byte,
               event_id | 4096 AS with_flag,
               xor(event_id, 1365) AS toggled,
               event_id << 2 AS shl2,
               event_id >> 3 AS shr3,
               CAST(bit_count(event_id) AS INTEGER) AS popcount
        FROM events
    """,
    tags=("function", "bitwise"),
)
def fn_bitwise(spark, sf_dir):
    """Bitwise AND/OR/XOR, shifts, popcount — pure integer ops,
    bit-identical across engines (the flag/mask arithmetic every
    fingerprint and bucket scheme builds on)."""
    ev = table(spark, sf_dir, "events")
    e = F.col("event_id")
    return ev.select(
        "event_id",
        e.bitwiseAND(F.lit(255)).alias("low_byte"),
        e.bitwiseOR(F.lit(4096)).alias("with_flag"),
        e.bitwiseXOR(F.lit(1365)).alias("toggled"),
        F.shiftleft(e, 2).alias("shl2"),
        F.shiftright(e, 3).alias("shr3"),
        F.bit_count(e).alias("popcount"),
    )


@register(
    "fn_struct",
    oracle="""
        SELECT c_custkey,
               ({'segment': c_mktsegment,
                 'balance': c_acctbal}).segment AS seg_out,
               ({'segment': c_mktsegment,
                 'balance': c_acctbal}).balance AS bal_out,
               len(({'segment': c_mktsegment,
                     'balance': c_acctbal}).segment) AS seg_len
        FROM customer
    """,
    tags=("function", "struct"),
)
def fn_struct(spark, sf_dir):
    """Struct construction + field access — the nested-record surface
    (named_struct / dot-path projection). Pure projection, zero
    shuffle; Catalyst collapses the build-then-access round trip so
    the fields never materialize twice. Output is the accessed
    FIELDS (struct cells are not hashable by the driver canonicalizer
    - same reason emb_label_centroids emits rows, not arrays)."""
    c = table(spark, sf_dir, "customer")
    profile = F.struct(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("balance"),
    )
    return c.select(
        "c_custkey",
        profile.getField("segment").alias("seg_out"),
        profile.getField("balance").alias("bal_out"),
        F.length(profile.getField("segment")).alias("seg_len"),
    )


@register(
    "fn_safe_arith",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 0 THEN NULL
                    ELSE CAST(o_totalprice
                              / (o_orderkey % 10) AS DOUBLE) END
                   AS safe_div,
               TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'oops'
                             ELSE CAST(o_orderkey AS VARCHAR) END
                        AS INTEGER) AS safe_cast
        FROM orders WHERE o_orderkey <= 1000
    """,
    tags=("function", "ansi-safe"),
)
def fn_safe_arith(spark, sf_dir):
    """ANSI-safe arithmetic: try_divide and try_cast return NULL where
    strict ANSI mode would abort the job (division by zero, malformed
    cast). This is the row-level error-tolerance contract a 100 TB
    pipeline needs — one bad record must poison one value, not kill a
    stage. The session runs ANSI-strict, so these are the sanctioned
    escape hatches."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice").cast("double"),
            (F.col("o_orderkey") % 10).cast("double"),
        ).alias("safe_div"),
        F.try_to_number(
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("oops")).otherwise(
                F.col("o_orderkey").cast("string")
            ),
            F.lit("999999999"),
        )
        .cast("int")
        .alias("safe_cast"),
    )


@register(
    "fn_array_hof",
    oracle="""
        WITH a AS (
            SELECT event_id,
                   [event_id % 7, event_id % 5, event_id % 3,
                    event_id % 11] AS xs
            FROM events WHERE event_id <= 2000
        )
        SELECT event_id,
               list_any_value(list_filter(xs, x -> x = 0)) IS NOT NULL
                   AS has_zero,
               len(list_filter(xs, x -> x >= 2)) = len(xs) AS all_ge_2,
               CAST(list_aggregate(xs, 'sum') AS BIGINT) AS total,
               array_to_string(list_transform(xs, x -> CAST(x * x AS VARCHAR)),
                               ',') AS squares
        FROM a
    """,
    tags=("function", "array", "hof"),
)
def fn_array_hof(spark, sf_dir):
    """Higher-order array functions: exists / forall / aggregate /
    transform — the lambda surface array columns are processed with
    (the JVM-side alternative to exploding). Oracle re-derives
    exists/forall from list_filter lengths, so the semantics (not just
    the function names) are what's pinned."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    xs = F.array(
        F.col("event_id") % 7,
        F.col("event_id") % 5,
        F.col("event_id") % 3,
        F.col("event_id") % 11,
    )
    a = ev.select("event_id", xs.alias("xs"))
    return a.select(
        "event_id",
        F.exists("xs", lambda x: x == 0).alias("has_zero"),
        F.forall("xs", lambda x: x >= 2).alias("all_ge_2"),
        F.aggregate(
            "xs", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total"),
        # stringified: array cells aren't hashable by the driver's
        # canonicalizer (same contract as fn_struct)
        F.array_join(
            F.transform("xs", lambda x: (x * x).cast("string")), ","
        ).alias("squares"),
    )


_URL_ORACLE = """
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/' || lang || '/doc/'
                   || doc_id || '?id=' || doc_id || '&lang=' || lang AS url
        FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
           regexp_extract(url, 'https?://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '[?&]id=([^&#]*)', 1) AS id_param
    FROM u
"""


@register("fn_url_parse", oracle=_URL_ORACLE, tags=("function", "string"))
def fn_url_parse(spark, sf_dir):
    """URL decomposition — host / path / query / single-parameter
    extraction via Spark's parse_url (a dedicated expression the oracle
    reproduces with regexes). The bread-and-butter of web-crawl
    ingestion: canonical-host grouping and per-parameter filters both
    start here. Pure codegen scan, no shuffle."""
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        F.col("lang"), F.lit("/doc/"), F.col("doc_id").cast("string"),
        F.lit("?id="), F.col("doc_id").cast("string"),
        F.lit("&lang="), F.col("lang"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )


@register(
    "fn_map_hof",
    oracle="""
        SELECT event_id,
               't=' || upper(event_type) || ';u=' || CAST(user_id AS VARCHAR)
                   AS upper_rendered,
               't=' || event_type AS filtered_rendered,
               't=' || event_type || '#1;u=' || CAST(user_id AS VARCHAR)
                   || '#2' AS zipped_rendered,
               2 AS n_entries
        FROM events
    """,
    tags=("function", "map"),
)
def fn_map_hof(spark, sf_dir):
    """Map higher-order functions — transform_values, map_filter,
    map_zip_with, map_entries — the JVM-side surface for reshaping
    dynamic-schema maps without exploding (fn_map covers construction
    and lookup; this covers the lambda algebra). Maps render to
    canonical sorted "k=v;…" strings because map cells are not
    hashable/oracle-comparable; the oracle re-derives the exact
    rendered strings from the source columns."""
    ev = table(spark, sf_dir, "events")
    m1 = F.create_map(
        F.lit("t"), F.col("event_type"),
        F.lit("u"), F.col("user_id").cast("string"),
    )
    m2 = F.create_map(
        F.lit("t"), F.lit("1"), F.lit("u"), F.lit("2")
    )

    def _render(m):
        return F.array_join(
            F.transform(
                F.array_sort(F.map_entries(m)),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
            ";",
        )

    upper = F.transform_values(m1, lambda k, v: F.upper(v))
    filtered = F.map_filter(m1, lambda k, v: k == "t")
    zipped = F.map_zip_with(
        m1, m2, lambda k, v1, v2: F.concat(v1, F.lit("#"), v2)
    )
    return ev.select(
        "event_id",
        _render(upper).alias("upper_rendered"),
        _render(filtered).alias("filtered_rendered"),
        _render(zipped).alias("zipped_rendered"),
        F.size(F.map_keys(m1)).alias("n_entries"),
    )
