"""Scalar function coverage (SURVEY.md §2.6: string / date / math /
conditional / array / JSON).

The reference's only scalar work is label formatting and `.get()`
defaults (app.py:375-388, :450); here each family gets a real query
over the driver tables. Everything stays in built-in functions (JVM
codegen, no Python in the row path). Cross-engine gotchas handled:
Spark `dayofweek` is 1=Sunday vs DuckDB 0=Sunday; DuckDB date_diff /
year return BIGINT (Spark side casts to long); array math is forced
to double on both sides before folding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..functions.numeric import finite_measure, finite_measure_sql
from ..registry import query


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey AS partkey,
           upper(p_brand) AS brand_upper,
           lower(p_type) AS type_lower,
           trim(p_name) AS name_trim,
           substring(p_name, 1, 10) AS name_head,
           concat_ws('|', p_brand, p_type) AS brand_type,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_type, ' ', '_') AS type_snake,
           p_type LIKE '%BRUSHED%' AS is_brushed,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos
    FROM part
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, trim, substring, concat, length, replace,
    LIKE, regexp extract/replace, position."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("partkey"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.trim("p_name").alias("name_trim"),
        F.substring("p_name", 1, 10).alias("name_head"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.col("p_type").like("%BRUSHED%").alias("is_brushed"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r"[aeiou]", "").alias("no_vowels"),
        F.instr(F.col("p_name"), "a").cast("long").alias("a_pos"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey AS orderkey,
           date_trunc('month', o_orderdate) AS order_month,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dy,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           epoch_us(o_orderdate) AS epoch_micro,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT)
             AS days_to_2002
    FROM orders
    """,
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: trunc, parts, day-of-week (normalized to
    Spark's 1=Sunday), formatting, epoch, interval arithmetic, diff."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("epoch_micro"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS net_r6,
           abs(l_discount - 0.05) AS disc_dev,
           sqrt(l_quantity) AS qty_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(log10(l_extendedprice), 6) AS price_log10,
           pow(l_quantity, 2) AS qty_sq,
           CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/abs/sqrt/ln/log10/pow/floor/mod/greatest/
    least/sign — all IEEE-deterministic, bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("net_r6"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.floor(F.col("l_quantity") / 7).alias("qty_div7"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT c_custkey AS custkey,
           CASE WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
           CASE WHEN c_acctbal >= 0 THEN c_acctbal ELSE 0.0 END AS bal_clamped,
           c_acctbal IS NULL AS bal_missing,
           if(c_nationkey % 2 = 0, 'even', 'odd') AS nation_parity
    FROM customer
    """,
    tags=("scalar", "conditional"),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family: CASE WHEN, nullif+coalesce, clamping,
    IS NULL, if() — the relational form of the reference's per-field
    display fallbacks (app.py:375-379)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal")).otherwise(0.0).alias("bal_clamped"),
        F.col("c_acctbal").isNull().alias("bal_missing"),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias("nation_parity"),
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[64] AS DOUBLE) AS last_val,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       (a, x) -> a + x) AS vec_sum,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       (a, x) -> CASE WHEN x > a THEN x ELSE a END) AS vec_max,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
    tags=("scalar", "array"),
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embedding column: size, element_at,
    fold (sum / max via F.aggregate), filter — the primitives the
    similarity operators build on. Elements are cast to double before
    folding so both engines accumulate identically."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", 64).cast("double").alias("last_val"),
        F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x).alias("vec_sum"),
        F.aggregate(
            dbl, F.lit(float("-inf")), lambda a, x: F.when(x > a, x).otherwise(a)
        ).alias("vec_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           json_extract_string(props, '$.missing') IS NULL AS missing_absent
    FROM events
    """,
    tags=("scalar", "json"),
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props: path extraction + cast, absent
    path -> null. The batch analog of the reference's ingest-time JSON
    flattening (producer.py:90-101)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_bucket"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_absent"),
    )


@query(
    "scalar_map_funcs",
    oracle="""
    -- DuckDB map extraction yields a 1-element list; [1] unwraps it
    WITH m AS (
        SELECT o_orderkey AS orderkey,
               map(['status', 'priority'],
                   [o_orderstatus, o_orderpriority]) AS props
        FROM orders
    )
    SELECT orderkey,
           CAST(cardinality(props) AS BIGINT) AS n_keys,
           array_to_string(list_sort(map_keys(props)), ',') AS keys_sorted,
           props['status'][1] AS status_val,
           props['priority'][1] AS priority_val,
           props['missing'][1] IS NULL AS missing_is_null
    FROM m
    """,
    tags=("scalar", "map"),
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: construction from entries, size, sorted key list,
    element lookup, absent-key null — the typed-dictionary column
    shape (per-row, narrow; maps never shuffle here). The key list is
    joined to one CSV string: the differential comparator hashes
    scalar cells only (a top-level ArrayType cell is unhashable)."""
    o = load_table(spark, sf_dir, "orders")
    props = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.size(props).cast("long").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(props)), ",").alias("keys_sorted"),
        F.element_at(props, "status").alias("status_val"),
        F.element_at(props, "priority").alias("priority_val"),
        F.element_at(props, "missing").isNull().alias("missing_is_null"),
    )


@query(
    "scalar_array_extended",
    oracle="""
    WITH t AS (
        SELECT l_orderkey AS orderkey,
               list_sort(list(l_linenumber)) AS lines,
               list_sort(list(DISTINCT l_returnflag)) AS flags
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT orderkey,
           array_to_string(lines, ',') AS lines,
           array_to_string(flags, ',') AS flags,
           CAST(len(lines) AS BIGINT) AS n_lines,
           lines[1] AS first_line,
           lines[len(lines)] AS last_line,
           CAST(list_position(lines, 3) AS BIGINT) AS pos_of_3,
           -- DuckDB slice past the end is NULL; Spark's is [] -> ''
           coalesce(array_to_string(lines[2:3], ','), '') AS middle_slice,
           array_to_string(flatten([lines, lines]), ',') AS doubled,
           3 IN (SELECT unnest(lines)) AS has_line3
    FROM t
    """,
    tags=("scalar", "array"),
)
def scalar_array_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family beyond the basics: collect_list + sort (the
    deterministic form of aggregation-to-array), distinct collect,
    indexing from both ends, position, slice, flatten, membership.
    collect_list order is partition-dependent, so every collected
    array is sorted before leaving the aggregation — the same rule
    the oracle applies. Array-valued outputs are CSV-joined at the
    edge: the differential comparator hashes scalar cells only."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.sort_array(F.collect_list("l_linenumber")).alias("lines"),
        F.sort_array(F.collect_set("l_returnflag")).alias("flags"),
    )
    lines = F.col("lines")

    def csv(arr):
        return F.array_join(F.transform(arr, lambda x: x.cast("string")), ",")

    return t.select(
        "orderkey",
        csv(lines).alias("lines"),
        F.array_join(F.col("flags"), ",").alias("flags"),
        F.size(lines).cast("long").alias("n_lines"),
        F.element_at(lines, 1).alias("first_line"),
        F.element_at(lines, -1).alias("last_line"),
        F.array_position(lines, 3).cast("long").alias("pos_of_3"),
        csv(F.slice(lines, 2, 2)).alias("middle_slice"),
        csv(F.flatten(F.array(lines, lines))).alias("doubled"),
        F.array_contains(lines, 3).alias("has_line3"),
    )


@query(
    "scalar_generator_funcs",
    oracle="""
    -- outer explode: an empty array must still yield one NULL row
    -- (emulated in the oracle with CASE len=0 THEN [NULL])
    WITH t AS (
        SELECT o_orderkey AS orderkey,
               CASE WHEN o_orderstatus = 'O' THEN []
                    ELSE [o_orderstatus, o_orderpriority] END AS arr
        FROM orders
    ),
    pos AS (
        SELECT orderkey, arr,
               unnest(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS item,
               unnest(CASE WHEN len(arr) = 0 THEN [NULL]
                           ELSE range(0, len(arr)) END) AS pos
        FROM t
    )
    SELECT orderkey, CAST(pos AS BIGINT) AS pos, item FROM pos
    """,
    tags=("scalar", "generator"),
)
def scalar_generator_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator family: posexplode_outer — rows from arrays with the
    outer semantics that keep empty-array parents (one NULL row)
    instead of dropping them. Narrow flat-map, no shuffle; parent
    row preserved for downstream joins regardless of array content."""
    o = load_table(spark, sf_dir, "orders")
    arr = F.when(F.col("o_orderstatus") == "O", F.array().cast("array<string>")).otherwise(
        F.array("o_orderstatus", "o_orderpriority")
    )
    return (
        o.select(F.col("o_orderkey").alias("orderkey"), arr.alias("arr"))
        .select(
            "orderkey",
            F.posexplode_outer("arr").alias("pos", "item"),
        )
        .select("orderkey", F.col("pos").cast("long").alias("pos"), "item")
    )


@query(
    "scalar_map_hof",
    oracle="""
    WITH m AS (
        SELECT o_orderkey AS orderkey,
               map(['status', 'priority'],
                   [o_orderstatus, o_orderpriority]) AS props
        FROM orders
    )
    SELECT orderkey,
           array_to_string(
               list_sort(list_transform(
                   list_filter(map_entries(props),
                               e -> upper(e.value) <> 'F'),
                   e -> e.key || '=' || upper(e.value))),
               ',') AS kept_entries
    FROM m
    """,
    tags=("scalar", "map", "hof"),
)
def scalar_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: transform_values (uppercase),
    map_filter (drop 'F' values), then flatten to a sorted
    'k=v' string — maps have no canonical cross-engine wire order,
    so the comparable form is the sorted entry list, same rule as
    collect_list ordering. All per-row, codegen'd, no shuffle."""
    o = load_table(spark, sf_dir, "orders")
    props = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    upped = F.transform_values(props, lambda k, v: F.upper(v))
    kept = F.map_filter(upped, lambda k, v: v != "F")
    entries = F.transform(
        F.map_entries(kept),
        lambda e: F.concat(e["key"], F.lit("="), e["value"]),
    )
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.array_join(F.sort_array(entries), ",").alias("kept_entries"),
    )


@query(
    "scalar_bool_aggs",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_totalprice > 400000) AS any_jumbo
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("scalar", "groupby", "bool"),
)
def scalar_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: count_if / bool_and / bool_or —
    predicate summaries in the aggregate layer (all codegen'd
    conditional accumulators, one shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count_if(F.col("o_orderstatus") == "F").cast("long").alias("n_finished"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(o_orderkey | 1 AS BIGINT) AS set_low,
           CAST(xor(o_orderkey, 255) AS BIGINT) AS flipped,
           CAST(o_orderkey << 2 AS BIGINT) AS shifted,
           CAST(o_orderkey >> 3 AS BIGINT) AS down
    FROM orders
    """,
    tags=("scalar", "bitwise"),
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts — the id-packing and flag
    arithmetic layer (per-row, narrow, no shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        k.alias("orderkey"),
        k.bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
        k.bitwiseOR(F.lit(1)).cast("long").alias("set_low"),
        k.bitwiseXOR(F.lit(255)).cast("long").alias("flipped"),
        F.shiftleft(k, 2).cast("long").alias("shifted"),
        F.shiftright(k, 3).cast("long").alias("down"),
    )


@query(
    "agg_by_json_field",
    oracle=f"""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n,
           CAST(CAST(SUM(CAST({finite_measure_sql("value")} AS DECIMAL(18,6)))
                     AS VARCHAR) AS DOUBLE)
             AS total_value
    FROM events
    GROUP BY k_mod
    """,
    tags=("scalar", "json", "groupby"),
)
def agg_by_json_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate keyed by a field EXTRACTED from a JSON column — the
    semi-structured analytics pattern (grouping on event properties
    that were never promoted to columns). The per-row parse happens
    once in the projection before the shuffle; at 100 TB the right
    move is still to promote hot JSON fields to real columns at
    ingest (parse cost scales with the scan), which is exactly what
    the reference's producer did by flattening upstream
    (producer.py:90-101) — this query is the fallback for the cold
    fields."""
    e = load_table(spark, sf_dir, "events")
    k_mod = (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_mod")
    return (
        e.select(k_mod, "value")
        .groupBy("k_mod")
        .agg(
            F.count("*").alias("n"),
            F.sum(finite_measure("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@query(
    "scalar_inline_structs",
    oracle="""
    WITH nested AS (
        SELECT l_orderkey AS orderkey,
               list_sort(list({'ln': l_linenumber, 'qty': l_quantity}))
                 AS lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT orderkey,
           CAST(u.ln AS INTEGER) AS linenumber,
           u.qty AS quantity
    FROM (SELECT orderkey, unnest(lines) AS u FROM nested)
    """,
    tags=("scalar", "struct", "generator"),
)
def scalar_inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct-array round trip: nest each order's line items into a
    sorted array<struct>, then INLINE the structs back to rows — the
    generator for nested-document shapes (posexplode handles scalar
    arrays; inline spreads struct fields into columns). Sorting the
    collected array is what makes the nested form deterministic —
    same rule as every collect_list here."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_quantity").alias("qty"),
                )
            )
        ).alias("lines")
    )
    return nested.select(
        "orderkey", F.inline("lines")
    ).select(
        "orderkey",
        F.col("ln").alias("linenumber"),
        F.col("qty").alias("quantity"),
    )


@query(
    "scalar_variant_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract(props, '$.k') AS BIGINT) % 7 AS k_mod7,
           json_extract(props, '$.missing') IS NULL AS missing_is_null,
           coalesce(CAST(json_valid(props) AS BOOLEAN), FALSE)
               AS is_valid_json
    FROM events
    """,
    tags=("scalar", "variant", "json"),
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT — the engine-native semi-structured type that
    replaces string-JSON reparsing: ``parse_json`` decodes once into
    a binary-encoded variant, ``variant_get`` extracts typed paths
    without re-tokenizing, ``try_parse_json`` yields NULL (not an
    error) on malformed input. At 100 TB this is the difference
    between parsing each JSON blob once versus once per extraction —
    the per-row map stays codegen'd and shuffle-free. The DuckDB
    oracle reads the same paths with its JSON type; the variant
    column itself never leaves the plan (comparator-safe scalars
    out)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k_val"),
        (
            F.expr("variant_get(parse_json(props), '$.k', 'long')") % 7
        ).alias("k_mod7"),
        F.expr("variant_get(parse_json(props), '$.missing', 'string')")
        .isNull()
        .alias("missing_is_null"),
        # NULL props -> false on BOTH sides (DuckDB json_valid(NULL) is
        # NULL while IS NOT NULL is false — the null sweep caught the
        # three-valued divergence; a missing document holds no valid JSON)
        F.expr("coalesce(try_parse_json(props) IS NOT NULL, false)").alias(
            "is_valid_json"
        ),
    )


@query(
    "scalar_try_funcs",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           TRY_CAST(event_type AS BIGINT) AS bad_int,
           CAST(TRY_CAST(CASE WHEN event_type = 'error' THEN 'not-a-date'
                              ELSE '2024-03-0' || CAST(1 + event_id % 9 AS VARCHAR)
                         END AS DATE) AS VARCHAR) AS maybe_date,
           CASE WHEN (event_id % 5) = 0 THEN NULL
                ELSE CAST(value AS DOUBLE) / CAST(event_id % 5 AS DOUBLE) END
             AS safe_div
    FROM events
    """,
    tags=("scalar", "error-handling", "ansi"),
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fault-tolerant scalar surface — the TRY_* family that keeps a
    100 TB batch alive when a few rows are malformed (ANSI mode
    would kill the job on the first bad cast): try_cast on a JSON
    field, on a guaranteed-bad string, on a data-dependent date
    string, and try_divide (NULL on zero divisor — rendered as the
    equivalent CASE on the DuckDB side, which has TRY_CAST but no
    TRY division). Error handling IS an operator contract:
    malformed input → NULL → flows through aggregates by SQL null
    semantics, never an exception.

    Scale shape: narrow map, no shuffle; pushdown/pruning untouched
    (plan-checked family-wide in test_plans)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").alias("k_int"),
        F.expr("try_cast(event_type AS BIGINT)").alias("bad_int"),
        F.expr(
            "cast(try_cast(CASE WHEN event_type = 'error' THEN 'not-a-date' "
            "ELSE concat('2024-03-0', cast(1 + event_id % 9 AS STRING)) END "
            "AS DATE) AS STRING)"
        ).alias("maybe_date"),
        # rendered as STRING / DOUBLE so null-on-error survives the
        # comparator (object-None vs NaT / Decimal-None vs NaN traps)
        F.expr(
            "try_divide(cast(value AS DOUBLE), cast(event_id % 5 AS DOUBLE))"
        ).alias("safe_div"),
    )


@query(
    "scalar_url_funcs",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://www.' || source || '.example.com/docs/'
                 || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2'
                 AS url
        FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
    tags=("scalar", "url", "string"),
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing — parse_url(HOST/PATH/QUERY key/PROTOCOL) over a
    synthesized-from-data URL column (the per-document web address a
    crawl pipeline carries). Spark's parse_url is a JVM-side
    expression (java.net.URI under the hood — no UDF); the oracle
    re-derives each component with anchored regexes, so agreement
    checks BOTH that parse_url splits where the RFC says and that the
    synthesis round-trips. Domain extraction is the first step of
    per-domain crawl caps and URL dedup at corpus scale; all per-row,
    codegen'd, zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


# Longest-prefix routing table for the CIDR query: (dotted net,
# prefix length, 2^(32-prefix) divisor — pinned so neither engine
# needs a bit-shift operator). IPs are synthesized inside
# 10.0.0.0/10, so /8 catches everything, the /12s and /11 carve it,
# and the /16s are the most-specific overrides.
_CIDR_TABLE = (
    ("10.0.0.0", 8, 16777216),
    ("10.0.0.0", 12, 1048576),
    ("10.16.0.0", 12, 1048576),
    ("10.32.0.0", 11, 2097152),
    ("10.0.0.0", 16, 65536),
    ("10.1.0.0", 16, 65536),
    ("10.16.32.0", 20, 4096),
)

_IP_SYNTH_SQL = "(167772160 + ((user_id * 2654435761) % 4194304))"


def _ip_cidr_oracle() -> str:
    vals = ", ".join(f"('{n}', {p}, {d})" for n, p, d in _CIDR_TABLE)
    dotted = (
        "CAST(ip_int // 16777216 AS VARCHAR) || '.' || "
        "CAST((ip_int // 65536) % 256 AS VARCHAR) || '.' || "
        "CAST((ip_int // 256) % 256 AS VARCHAR) || '.' || "
        "CAST(ip_int % 256 AS VARCHAR)"
    )
    parse = (
        "CAST(string_split({c}, '.')[1] AS BIGINT) * 16777216 + "
        "CAST(string_split({c}, '.')[2] AS BIGINT) * 65536 + "
        "CAST(string_split({c}, '.')[3] AS BIGINT) * 256 + "
        "CAST(string_split({c}, '.')[4] AS BIGINT)"
    )
    return f"""
    WITH ips AS (
        SELECT event_id, user_id, {_IP_SYNTH_SQL} AS ip_int FROM events
    ),
    strs AS (
        SELECT event_id, user_id, ip_int, {dotted} AS ip FROM ips
    ),
    rt AS (
        SELECT net, prefix_len, shift_div,
               {parse.format(c="net")} AS net_int
        FROM (VALUES {vals}) AS t(net, prefix_len, shift_div)
    ),
    matched AS (
        SELECT s.event_id, s.user_id, r.net, r.prefix_len,
               row_number() OVER (
                   PARTITION BY s.event_id
                   ORDER BY r.prefix_len DESC, r.net) AS rn
        FROM strs s JOIN rt r
          ON ({parse.format(c="s.ip")}) // r.shift_div
             = r.net_int // r.shift_div
    )
    SELECT net || '/' || CAST(prefix_len AS VARCHAR) AS subnet,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM matched WHERE rn = 1
    GROUP BY net, prefix_len
    ORDER BY subnet
    """


@query(
    "scalar_ipv4_cidr",
    oracle=_ip_cidr_oracle(),
    tags=("scalar", "network", "cidr", "engine-addition"),
)
def scalar_ipv4_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 parsing + longest-prefix CIDR routing — the network-log
    kernel (flow attribution, geo/ASN rollups, abuse triage) a general
    analytics engine must own. A deterministic client IP inside
    10.0.0.0/10 is synthesized per event (Knuth-hash of user_id),
    formatted dotted-quad, then PARSED BACK from the string and
    longest-prefix-matched against a pinned 7-entry routing table
    spanning /8../20 — so every event matches several nets and the
    most-specific must win. No bit-shift operator exists in both SQL
    dialects, so prefix masks are pinned power-of-two divisors and
    the match is integer division equality (ip div 2^(32-p) = net div
    2^(32-p)) — exact in both engines.

    Scale shape: per-row string/integer work fused into the scan; the
    routing table is a 7-row broadcast (every real routing/geo table
    fits memory); ONE shuffle for the per-event argmax + subnet
    rollup. The distinct-user count is the only wide aggregate."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    ips = e.selectExpr(
        "event_id", "user_id", f"{_IP_SYNTH_SQL} AS ip_int"
    ).selectExpr(
        "event_id",
        "user_id",
        "CAST(ip_int div 16777216 AS STRING) || '.' || "
        "CAST((ip_int div 65536) % 256 AS STRING) || '.' || "
        "CAST((ip_int div 256) % 256 AS STRING) || '.' || "
        "CAST(ip_int % 256 AS STRING) AS ip",
    )
    rt = spark.createDataFrame(
        [(n, p, d) for n, p, d in _CIDR_TABLE],
        "net string, prefix_len int, shift_div long",
    )
    parse = (
        "CAST(split({c}, '[.]')[0] AS BIGINT) * 16777216 + "
        "CAST(split({c}, '[.]')[1] AS BIGINT) * 65536 + "
        "CAST(split({c}, '[.]')[2] AS BIGINT) * 256 + "
        "CAST(split({c}, '[.]')[3] AS BIGINT)"
    )
    rt = rt.selectExpr(
        "net",
        "prefix_len",
        "shift_div",
        f"({parse.format(c='net')}) div shift_div AS net_shifted",
    )
    # Scalable longest-prefix match: parse ONCE, explode each event
    # over the table's DISTINCT prefix lengths (pinned), and
    # equi-join on (prefix_len, shifted ip) — a broadcast HASH join,
    # where the naive form (ip div shift = net div shift, shift from
    # the build side) degenerates to a nested-loop re-parsing the ip
    # per routing row.
    plens = sorted({(p, d) for _, p, d in _CIDR_TABLE})
    plen_arr = ", ".join(
        f"named_struct('prefix_len', {p}, 'shift_div', CAST({d} AS BIGINT))"
        for p, d in plens
    )
    cand = ips.selectExpr(
        "event_id",
        "user_id",
        f"({parse.format(c='ip')}) AS parsed_int",
    ).selectExpr(
        "event_id",
        "user_id",
        "parsed_int",
        f"inline(array({plen_arr}))",
    ).selectExpr(
        "event_id",
        "user_id",
        "prefix_len",
        "parsed_int div shift_div AS net_shifted",
    )
    matched = cand.join(F.broadcast(rt), ["prefix_len", "net_shifted"])
    w = Window.partitionBy("event_id").orderBy(
        F.col("prefix_len").desc(), "net"
    )
    return (
        matched.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("net", "prefix_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .selectExpr(
            "net || '/' || CAST(prefix_len AS STRING) AS subnet",
            "n_events",
            "n_users",
        )
        .orderBy("subnet")
    )
