"""Scalar expression / function matrix.

Mirrors the reference's expression translation surface (crates/sql/src/
sql_generator/expr.rs: binary ops :258-287, NOT/IS NULL :94-110, CAST
:112-121, literals :289-338, function calls :340-403) and the dialect
function matrix (§2.5: coalesce/nullif/length/substr/upper/lower/trim/
concat/instr/regexp/abs/ceil/floor/round/mod/power/sqrt/date parts...).

Cross-engine notes baked into these queries (each one is a real
portability hazard the dialect layer must own):
- regexp_replace: Spark replaces ALL matches; DuckDB needs the 'g' flag.
- dayofweek: Spark is 1=Sunday..7; DuckDB 0=Sunday..6 — oracle adds 1.
- double->int CAST: Spark truncates, DuckDB rounds — use explicit
  floor()/round() instead of bare casts across engines.
- transcendentals (pow/exp/ln) are not bit-identical across libm
  implementations — only sqrt is IEEE-exact; integer powers via x*x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query


@query(
    "expr_string_functions",
    oracle="""
    SELECT c_custkey,
           length(c_name)                       AS name_len,
           upper(c_mktsegment)                  AS seg_upper,
           lower(c_name)                        AS name_lower,
           substr(c_name, 3, 5)                 AS name_mid,
           concat_ws('-', c_mktsegment, c_name) AS seg_name,
           strpos(c_name, '1')                  AS pos_one,
           trim(c_name)                         AS name_trim,
           regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
           (c_name LIKE '%er%')                 AS has_er,
           reverse(c_mktsegment)                AS seg_rev,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded
    FROM customer
    WHERE c_custkey <= 500
    """,
)
def expr_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.length("c_name").alias("name_len"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 3, 5).alias("name_mid"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.instr("c_name", "1").alias("pos_one"),
        F.trim("c_name").alias("name_trim"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.col("c_name").like("%er%").alias("has_er"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
    )


@query(
    "expr_math_functions",
    oracle="""
    SELECT c_custkey,
           abs(c_acctbal - 5000.0)            AS dist_from_5k,
           ceil(c_acctbal)                    AS bal_ceil,
           floor(c_acctbal)                   AS bal_floor,
           round(c_acctbal, 1)                AS bal_round1,
           c_custkey % 7                      AS key_mod7,
           c_acctbal * c_acctbal              AS bal_sq,
           sqrt(abs(c_acctbal))               AS bal_sqrt,
           CAST(sign(c_acctbal - 5000.0) AS DOUBLE) AS bal_sign,
           greatest(c_acctbal, 5000.0)        AS bal_hi,
           least(c_acctbal, 5000.0)           AS bal_lo
    FROM customer
    """,
    notes="ceil/floor return DOUBLE in DuckDB; Spark returns LONG — normalized via oracle schema below",
)
def expr_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.abs(F.col("c_acctbal") - 5000.0).alias("dist_from_5k"),
        F.ceil("c_acctbal").cast("double").alias("bal_ceil"),
        F.floor("c_acctbal").cast("double").alias("bal_floor"),
        F.round("c_acctbal", 1).alias("bal_round1"),
        (F.col("c_custkey") % 7).alias("key_mod7"),
        (F.col("c_acctbal") * F.col("c_acctbal")).alias("bal_sq"),
        F.sqrt(F.abs("c_acctbal")).alias("bal_sqrt"),
        F.signum(F.col("c_acctbal") - 5000.0).alias("bal_sign"),
        F.greatest(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_hi"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_lo"),
    )


@query(
    "expr_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate)    AS yr,
           EXTRACT(month FROM o_orderdate)   AS mo,
           EXTRACT(day FROM o_orderdate)     AS dy,
           EXTRACT(quarter FROM o_orderdate) AS qtr,
           dayofweek(o_orderdate) + 1        AS dow,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + 30    AS due_date,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey <= 1000
    """,
    notes="dayofweek normalized to Spark's 1=Sunday convention in the oracle",
)
def expr_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch_start"),
    )


@query(
    "expr_conditional_null",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 35 THEN 'medium'
                ELSE 'large' END                        AS size_class,
           coalesce(NULLIF(l_tax, 0.0), -1.0)           AS tax_or_sentinel,
           (l_discount BETWEEN 0.02 AND 0.06)           AS mid_discount,
           (l_returnflag IN ('R', 'A'))                 AS was_returned_or_ack,
           (NULLIF(l_tax, 0.0) IS NULL)                 AS tax_free,
           ifnull(NULLIF(l_linestatus, 'O'), 'OPEN')    AS status_or_open
    FROM lineitem
    WHERE l_orderkey <= 400
    """,
)
def expr_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    tax_null = F.nullif(F.col("l_tax"), F.lit(0.0))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 35, "medium")
        .otherwise("large")
        .alias("size_class"),
        F.coalesce(tax_null, F.lit(-1.0)).alias("tax_or_sentinel"),
        F.col("l_discount").between(0.02, 0.06).alias("mid_discount"),
        F.col("l_returnflag").isin("R", "A").alias("was_returned_or_ack"),
        tax_null.isNull().alias("tax_free"),
        F.ifnull(F.nullif(F.col("l_linestatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
    )


@query(
    "expr_cast_matrix",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS INTEGER)          AS key_int,
           CAST(o_orderkey AS DOUBLE)           AS key_double,
           CAST(o_orderkey AS VARCHAR)          AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(o_orderdate AS DATE)            AS order_date,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str,
           CAST(o_totalprice > 100000 AS INTEGER) AS is_big,
           CAST(floor(o_totalprice) AS BIGINT)  AS price_floor
    FROM orders
    WHERE o_orderkey <= 1000
    """,
    notes="CAST via TypeMapper (expr.rs:112-121, dialect.rs:115-150); double->int goes through floor() because bare casts truncate in Spark but round in DuckDB",
)
def expr_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("int").alias("key_int"),
        F.col("o_orderkey").cast("double").alias("key_double"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.to_date("o_orderdate").alias("order_date"),
        F.to_date("o_orderdate").cast("string").alias("date_str"),
        (F.col("o_totalprice") > 100000).cast("int").alias("is_big"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
    )


@query(
    "expr_unpivot_measures",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, measure, CAST(val AS DOUBLE) AS val
    FROM (
      SELECT l_orderkey, l_linenumber,
             l_quantity AS qty, l_extendedprice AS price, l_discount AS disc
      FROM lineitem WHERE l_orderkey < 200
    )
    UNPIVOT (val FOR measure IN (qty, price, disc))
    ORDER BY l_orderkey, l_linenumber, measure
    """,
    notes=(
        "UNPIVOT / melt: wide measures to long (Spark stack() == SQL "
        "UNPIVOT). Map-only — the explode happens inside the projection, "
        "no shuffle beyond the final presentation sort"
    ),
)
def expr_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            F.expr(
                "stack(3, 'qty', l_quantity, 'price', l_extendedprice, "
                "'disc', l_discount) AS (measure, val)"
            ),
        )
        .select("l_orderkey", "l_linenumber", "measure", F.col("val").cast("double").alias("val"))
        .orderBy("l_orderkey", "l_linenumber", "measure")
    )


@query(
    "expr_regexp_matrix",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_matches(text, 'join') AS has_join,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS novowel_len,
           CAST(length(text) - length(regexp_replace(text, 'a', '', 'g')) AS BIGINT) AS n_a
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    notes=(
        "regular-expression surface: extract (group 1), boolean match, "
        "global replace, occurrence counting via replace-length delta. "
        "Patterns stay in the Java-regex/RE2 shared subset (the repo's "
        "normalize_text convention) so both engines agree"
    ),
)
def expr_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.col("text").rlike("join").alias("has_join"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("novowel_len"),
        (F.length("text") - F.length(F.regexp_replace("text", "a", ""))).cast("bigint").alias("n_a"),
    ).orderBy("doc_id")


@query(
    "expr_json_matrix",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 7 AS k_mod,
           (json_extract(props, '$.missing') IS NULL) AS missing_is_null,
           (json_extract(props, '$.k') IS NOT NULL) AS has_k
    FROM events
    WHERE event_id < 300
    ORDER BY event_id
    """,
    notes=(
        "semi-structured JSON column surface (the reference ingests "
        "nested JSON from REST sources, rest.rs:564): typed path "
        "extraction, arithmetic on the extracted value, missing-path "
        "null semantics, key-presence probe"
    ),
)
def expr_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id",
        k.alias("k"),
        (k % 7).alias("k_mod"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
    ).orderBy("event_id")


@query(
    "expr_vectorized_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity * 2.5 + 1.0 AS boosted,
           length(l_returnflag) + CAST(l_quantity AS BIGINT) AS mixed
    FROM lineitem
    WHERE l_orderkey < 200
    ORDER BY l_orderkey, l_linenumber
    """,
    notes=(
        "the in-engine UDF surface (SURVEY 2.7 — the reference has no "
        "UDF registration; Spark does): an Arrow-batched pandas_udf "
        "(Series->Series, no row-at-a-time Python) computing "
        "q*2.5+1, registered and invoked through spark.sql, plus a "
        "mixed built-in/UDF expression. Oracle is the same arithmetic "
        "inline — per-row IEEE ops, bit-identical across engines"
    ),
)
def expr_vectorized_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    # no type annotations: this module uses `from __future__ import
    # annotations`, which stringifies them and pyspark's signature
    # inference rejects string hints — the explicit returnType governs
    @pandas_udf("double")
    def boost(q):
        return q * 2.5 + 1.0

    spark.udf.register("iv_boost", boost)
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("iv_lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               iv_boost(l_quantity) AS boosted,
               length(l_returnflag) + CAST(l_quantity AS BIGINT) AS mixed
        FROM iv_lineitem
        WHERE l_orderkey < 200
        ORDER BY l_orderkey, l_linenumber
        """
    )


@query(
    "expr_try_cast_matrix",
    oracle="""
    SELECT c_custkey,
           TRY_CAST(c_name AS INT)                                     AS name_int,
           TRY_CAST(CAST(c_custkey AS VARCHAR) AS INT)                 AS key_roundtrip,
           TRY_CAST(concat('2024-',
                lpad(CAST(c_custkey % 20 AS VARCHAR), 2, '0'),
                '-15') AS DATE)                                        AS maybe_date,
           TRY_CAST(CASE WHEN c_custkey % 2 = 0 THEN 'true'
                         ELSE 'zzz' END AS BOOLEAN)                    AS maybe_bool,
           c_custkey / NULLIF(c_custkey % 3, 0)                        AS try_div,
           str_split(c_name, '#')[5]                                   AS oob_elem
    FROM customer
    WHERE c_custkey <= 500
    ORDER BY c_custkey
    """,
    notes=(
        "error-safe expression matrix (SQL TRY_ semantics; reference "
        "accepts DataFusion's try-cast surface): try_cast across "
        "int/date/boolean with per-row valid+invalid inputs, "
        "try_divide (NULL on zero divisor), try_element_at out of "
        "bounds — Spark functions vs DuckDB TRY_CAST/NULLIF/list-index "
        "NULL semantics"
    ),
)
def expr_try_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    month = F.lpad((F.col("c_custkey") % 20).cast("string"), 2, "0")
    return c.select(
        "c_custkey",
        F.col("c_name").try_cast("int").alias("name_int"),
        F.col("c_custkey").cast("string").try_cast("int").alias("key_roundtrip"),
        F.concat(F.lit("2024-"), month, F.lit("-15"))
        .try_cast("date")
        .alias("maybe_date"),
        F.when(F.col("c_custkey") % 2 == 0, "true")
        .otherwise("zzz")
        .try_cast("boolean")
        .alias("maybe_bool"),
        F.try_divide(F.col("c_custkey"), F.col("c_custkey") % 3).alias("try_div"),
        F.try_element_at(F.split("c_name", "#"), F.lit(5)).alias("oob_elem"),
    ).orderBy("c_custkey")


@query(
    "expr_map_functions",
    oracle="""
    SELECT c_custkey,
           map(['key','seg'],
               [CAST(c_custkey AS VARCHAR), c_mktsegment])['key'][1]   AS v_key,
           map(['key','seg'],
               [CAST(c_custkey AS VARCHAR), c_mktsegment])['nope'][1]  AS v_missing,
           array_to_string(map_keys(map(['key','seg'],
               [CAST(c_custkey AS VARCHAR), c_mktsegment])), ',')      AS ks,
           array_to_string(map_values(map(['key','seg'],
               [CAST(c_custkey AS VARCHAR), c_mktsegment])), ',')      AS vs,
           CAST(cardinality(map(['key','seg'],
               [CAST(c_custkey AS VARCHAR), c_mktsegment])) AS BIGINT) AS n
    FROM customer
    WHERE c_custkey <= 300
    ORDER BY c_custkey
    """,
    notes=(
        "map-type surface: map_from_arrays construction, key lookup "
        "(present + missing -> NULL via try_element_at; DuckDB map "
        "extract returns a list, unwrapped with [1]), map_keys / "
        "map_values insertion order (joined to CSV scalars so every "
        "output column is driver-hashable — the r16 red row returned "
        "raw arrays that pandas sort_values cannot factorize), "
        "cardinality"
    ),
)
def expr_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    m = F.map_from_arrays(
        F.array(F.lit("key"), F.lit("seg")),
        F.array(F.col("c_custkey").cast("string"), F.col("c_mktsegment")),
    )
    return c.select(
        "c_custkey",
        F.try_element_at(m, F.lit("key")).alias("v_key"),
        F.try_element_at(m, F.lit("nope")).alias("v_missing"),
        F.array_join(F.map_keys(m), ",").alias("ks"),
        F.array_join(F.map_values(m), ",").alias("vs"),
        F.size(m).cast("bigint").alias("n"),
    ).orderBy("c_custkey")


@query(
    "expr_sequence_explode",
    oracle="""
    SELECT n_nationkey,
           CAST(unnest(generate_series(1, (n_nationkey % 5) + 1)) AS BIGINT) AS gs
    FROM nation
    ORDER BY n_nationkey, gs
    """,
    notes=(
        "per-row integer series fan-out: Spark explode(sequence(...)) "
        "vs DuckDB unnest(generate_series(...)) — the table-function "
        "lateral shape both engines rewrite to a generator"
    ),
)
def expr_sequence_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    return (
        n.select(
            "n_nationkey",
            # generators can't nest inside expressions — explode first,
            # cast in a second projection
            F.explode(F.sequence(F.lit(1), (F.col("n_nationkey") % 5) + 1)).alias("_g"),
        )
        .select("n_nationkey", F.col("_g").cast("bigint").alias("gs"))
        .orderBy("n_nationkey", "gs")
    )


@query(
    "agg_boolean_bitwise",
    oracle="""
    SELECT o_orderstatus,
           CAST(count_if(o_totalprice > 100000) AS BIGINT)    AS n_big,
           bool_and(o_custkey > 0)                            AS all_pos,
           bool_or(o_orderpriority = '1-URGENT')              AS any_urgent,
           CAST(bit_and(o_custkey) AS BIGINT)                 AS band,
           CAST(bit_or(o_custkey % 16) AS BIGINT)             AS bor,
           CAST(bit_xor(o_orderkey) AS BIGINT)                AS bxor
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    notes=(
        "boolean + bitwise aggregate family: count_if, bool_and/bool_or, "
        "bit_and/bit_or/bit_xor — integer/boolean outputs are "
        "order-independent, so cross-engine comparison is exact"
    ),
)
def agg_boolean_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            F.bool_and(F.col("o_custkey") > 0).alias("all_pos"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.bit_and(F.col("o_custkey")).cast("bigint").alias("band"),
            F.bit_or(F.col("o_custkey") % 16).cast("bigint").alias("bor"),
            F.bit_xor(F.col("o_orderkey")).cast("bigint").alias("bxor"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "expr_struct_operations",
    oracle="""
    SELECT o_orderkey,
           ({'s': o_orderstatus, 'p': o_orderpriority}).p            AS fld,
           {'s': o_orderstatus, 'p': o_orderpriority}
             < {'s': 'O', 'p': '3-MEDIUM'}                           AS lt_lit,
           ({'s': o_orderstatus, 'p': o_orderpriority}
             = {'s': o_orderstatus, 'p': o_orderpriority})           AS eq_self,
           (list_sort([{'k': o_custkey % 7, 'v': 'a'},
                       {'k': o_custkey % 3, 'v': 'b'}])[1]).v        AS min_v,
           (list_sort([{'k': o_custkey % 7, 'v': 'a'},
                       {'k': o_custkey % 3, 'v': 'b'}])[2]).k        AS max_k
    FROM orders
    WHERE o_orderkey <= 2000
    ORDER BY o_orderkey
    """,
    notes=(
        "struct-type surface: named construction, field access, "
        "lexicographic struct comparison (literal + self-equality), and "
        "sorting an array of structs then extracting fields — Spark "
        "struct/getField/sort_array vs DuckDB struct_pack/dot/list_sort "
        "(both order structs by field sequence; DuckDB lists are "
        "1-indexed)"
    ),
)
def expr_struct_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    st = F.struct(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    )
    lit = F.struct(F.lit("O").alias("s"), F.lit("3-MEDIUM").alias("p"))
    pair = F.sort_array(
        F.array(
            F.struct((F.col("o_custkey") % 7).alias("k"), F.lit("a").alias("v")),
            F.struct((F.col("o_custkey") % 3).alias("k"), F.lit("b").alias("v")),
        )
    )
    return o.select(
        "o_orderkey",
        st.getField("p").alias("fld"),
        (st < lit).alias("lt_lit"),
        (st == st).alias("eq_self"),
        pair.getItem(0).getField("v").alias("min_v"),
        pair.getItem(1).getField("k").alias("max_k"),
    ).orderBy("o_orderkey")


@query(
    "expr_url_parse",
    oracle="""
    WITH u AS (
      SELECT c_custkey,
             concat('https://EX', CAST(c_custkey % 5 AS VARCHAR),
                    '.example.com/cat/', CAST(c_custkey % 7 AS VARCHAR),
                    '/item/', CAST(c_custkey AS VARCHAR),
                    '?id=', CAST(c_custkey AS VARCHAR),
                    '&utm_source=news&ref=', c_mktsegment,
                    '#sec', CAST(c_custkey % 3 AS VARCHAR)) AS url
      FROM customer WHERE c_custkey <= 400
    )
    SELECT c_custkey,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)      AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1)                AS query,
           regexp_extract(url, '#(.*)$', 1)                    AS fragment,
           regexp_extract(url, '[?&]id=([^&#]*)', 1)           AS q_id,
           regexp_extract(url, '^([a-z]+)://', 1)              AS protocol
    FROM u ORDER BY c_custkey
    """,
    notes=(
        "URL decomposition matrix: Spark parse_url (Hive semantics — "
        "HOST/PATH/QUERY/REF/PROTOCOL + keyed QUERY lookup) vs an "
        "independent regexp decomposition in DuckDB; URLs synthesized "
        "with mixed-case hosts, query strings, and fragments"
    ),
)
def expr_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    u = c.select(
        "c_custkey",
        F.concat(
            F.lit("https://EX"),
            (F.col("c_custkey") % 5).cast("string"),
            F.lit(".example.com/cat/"),
            (F.col("c_custkey") % 7).cast("string"),
            F.lit("/item/"),
            F.col("c_custkey").cast("string"),
            F.lit("?id="),
            F.col("c_custkey").cast("string"),
            F.lit("&utm_source=news&ref="),
            F.col("c_mktsegment"),
            F.lit("#sec"),
            (F.col("c_custkey") % 3).cast("string"),
        ).alias("url"),
    )
    return u.select(
        "c_custkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("q_id"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    ).orderBy("c_custkey")


@query(
    "expr_collation_compare",
    oracle="""
    WITH m AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
                  WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment)
                  ELSE c_mktsegment END AS seg
      FROM customer WHERE c_custkey <= 600
    )
    SELECT c_custkey, seg,
           lower(seg) = 'building'                        AS is_building,
           lower(seg) IN ('machinery', 'furniture')       AS in_set,
           lower(seg) < 'household'                       AS lt_household
    FROM m ORDER BY c_custkey
    """,
    notes=(
        "string collation surface (Spark 4 COLLATE): case-insensitive "
        "equality / IN / ordering comparison via UTF8_LCASE on "
        "mixed-case data — the oracle derives the same truths with "
        "lower(), an independent mechanism. Comparisons only; the "
        "collated string itself is never exposed (its case would be "
        "representative-dependent)"
    ),
)
def expr_collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 600)
    seg = (
        F.when(F.col("c_custkey") % 3 == 0, F.upper("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment"))
    )
    m = c.select("c_custkey", seg.alias("seg"))
    lc = F.collate(F.col("seg"), "UTF8_LCASE")
    return m.select(
        "c_custkey",
        "seg",
        (lc == F.lit("building")).alias("is_building"),
        lc.isin("machinery", "furniture").alias("in_set"),
        (lc < F.lit("household")).alias("lt_household"),
    ).orderBy("c_custkey")


@query(
    "expr_xml_extract",
    oracle="""
    WITH x AS (
      SELECT o_orderkey,
             concat('<o><k>', CAST(o_orderkey AS VARCHAR),
                    '</k><p>', o_orderpriority,
                    '</p><q>', CAST(o_orderkey % 7 AS VARCHAR),
                    '</q><q>', CAST(o_orderkey % 3 AS VARCHAR),
                    '</q></o>') AS xml
      FROM orders WHERE o_orderkey <= 4000
    )
    SELECT o_orderkey,
           CAST(regexp_extract(xml, '<k>([^<]*)</k>', 1) AS BIGINT)  AS k,
           regexp_extract(xml, '<p>([^<]*)</p>', 1)                  AS p,
           CAST(regexp_extract(xml, '<q>([^<]*)</q>', 1) AS INT)
             + CAST(regexp_extract(xml, '</q><q>([^<]*)</q>', 1) AS INT) AS q_sum
    FROM x ORDER BY o_orderkey
    """,
    notes=(
        "XML decomposition (Spark 4 from_xml + Hive xpath family): "
        "struct-schema parse for scalar fields and an XPath aggregate "
        "over repeated elements, vs an independent regexp oracle. XML "
        "synthesized from orders columns so both engines see identical "
        "documents"
    ),
)
def expr_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 4000)
    xml = F.concat(
        F.lit("<o><k>"), F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"), F.col("o_orderpriority"),
        F.lit("</p><q>"), (F.col("o_orderkey") % 7).cast("string"),
        F.lit("</q><q>"), (F.col("o_orderkey") % 3).cast("string"),
        F.lit("</q></o>"),
    )
    x = o.select("o_orderkey", xml.alias("xml"))
    v = F.from_xml("xml", "k BIGINT, p STRING")
    return x.select(
        "o_orderkey",
        v.getField("k").alias("k"),
        v.getField("p").alias("p"),
        F.expr("xpath_int(xml, 'sum(/o/q)')").alias("q_sum"),
    ).orderBy("o_orderkey")


@query(
    "expr_variant_json",
    oracle="""
    SELECT event_id,
           CAST(props ->> '$.k' AS BIGINT)  AS k_val,
           CAST(props ->> '$.missing' AS BIGINT) AS k_missing,
           (props ->> '$.k') IS NOT NULL    AS has_k
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    notes=(
        "VARIANT type surface (Spark 4 semi-structured type): "
        "parse_json -> variant, typed variant_get extraction (present "
        "path, missing path -> NULL, existence test) over the events "
        "props JSON column vs DuckDB's JSON operators — the "
        "open-schema ingestion path for semi-structured event data"
    ),
)
def expr_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_val"),
        F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"),
        F.try_variant_get(v, "$.k", "bigint").isNotNull().alias("has_k"),
    ).orderBy("event_id")


@query(
    "expr_width_bucket_histogram",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice >= 600000 THEN 13
                     ELSE floor(o_totalprice / 50000.0) + 1 END AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1 ORDER BY bucket
    """,
    notes=(
        "equi-width histogram via width_bucket(x, 0, 600000, 12) vs an "
        "arithmetic oracle. Bounds chosen so the bucket width (50000) "
        "is exact in binary — both engines then compute the identical "
        "IEEE division and floor, with the >= upper-bound overflow "
        "bucket (n+1) made explicit in the oracle"
    ),
)
def expr_width_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12)).alias(
                "bucket"
            ),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "expr_fuzzy_levenshtein",
    oracle="""
    SELECT c_custkey,
           levenshtein(lower(c_name), lower(c_mktsegment))       AS d_seg,
           levenshtein(c_mktsegment, reverse(c_mktsegment))      AS d_rev,
           levenshtein(c_name, regexp_replace(c_name, '[0-9]', '', 'g')) AS d_digits,
           CASE WHEN levenshtein(lower(c_name), lower(c_mktsegment)) <= 15
                THEN levenshtein(lower(c_name), lower(c_mktsegment)) ELSE -1
           END                                                    AS d_thresh,
           (levenshtein(c_name, c_name) = 0)                      AS self_zero
    FROM customer
    WHERE c_custkey <= 400
    ORDER BY c_custkey
    """,
    notes=(
        "edit-distance surface for fuzzy matching / near-dup keys: "
        "levenshtein is one of the few string-similarity functions "
        "both engines compute as an exact integer (unlike jaro/"
        "soundex). Spark's 3-arg bounded form (levenshtein(a, b, k) "
        "-> -1 above the bound, an O(k*n) early-exit for join "
        "pruning) has no DuckDB native equivalent, so the oracle "
        "reproduces it with CASE over the exact distance. The bound "
        "15 sits INSIDE the measured d_seg range [14, 17] so the "
        "threshold column carries both -1 and real distances "
        "(self-review: the first draft's bound 12 made it constant)"
    ),
)
def expr_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    d_seg = F.levenshtein(F.lower("c_name"), F.lower("c_mktsegment"))
    return c.select(
        "c_custkey",
        d_seg.alias("d_seg"),
        F.levenshtein(F.col("c_mktsegment"), F.reverse("c_mktsegment")).alias(
            "d_rev"
        ),
        F.levenshtein(
            F.col("c_name"), F.regexp_replace("c_name", "[0-9]", "")
        ).alias("d_digits"),
        F.levenshtein(F.lower("c_name"), F.lower("c_mktsegment"), 15).alias(
            "d_thresh"
        ),
        (F.levenshtein("c_name", "c_name") == 0).alias("self_zero"),
    ).orderBy("c_custkey")


@query(
    "expr_array_set_ops",
    oracle="""
    WITH t AS (
      SELECT p_partkey,
             list_concat(string_split(p_name, ' '),
                         [string_split(p_name, ' ')[1]])        AS a,
             [string_split(p_name, ' ')[-1], lower(p_type)]     AS b
      FROM part WHERE p_partkey <= 400
    )
    SELECT p_partkey,
           coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '')  AS union_csv,
           coalesce(array_to_string(list_sort(list_distinct(list_intersect(a, b))), ','), '') AS intersect_csv,
           coalesce(array_to_string(list_sort(list_distinct(
             list_filter(a, x -> NOT list_contains(b, x)))), ','), '')        AS except_csv,
           CAST(len(list_distinct(list_concat(a, b))) AS INT)                 AS n_union,
           CAST(len(list_distinct(list_intersect(a, b))) AS INT)              AS n_intersect
    FROM t ORDER BY p_partkey
    """,
    notes=(
        "array set algebra (union/intersect/except with set semantics) "
        "over word arrays, reduced to sorted-CSV scalars + counts so "
        "every output is driver-hashable (the discipline the r16 map "
        "entry broke). Input a carries a deliberate duplicate (first "
        "word repeated) and b shares a's last word, so dedup and "
        "overlap are both data-bearing. Spark's array_union/"
        "array_intersect/array_except dedup by definition; DuckDB "
        "composes list_distinct with concat/intersect/filter, and its "
        "array_to_string of an empty list is NULL — coalesced to '' "
        "to match Spark's array_join"
    ),
)
def expr_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 400)
    w = F.split("p_name", " ")
    a = F.concat(w, F.array(F.element_at(w, 1)))
    b = F.array(F.element_at(w, -1), F.lower("p_type"))
    return p.select(
        "p_partkey",
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("union_csv"),
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias(
            "intersect_csv"
        ),
        F.array_join(F.array_sort(F.array_except(a, b)), ",").alias("except_csv"),
        F.size(F.array_union(a, b)).alias("n_union"),
        F.size(F.array_intersect(a, b)).alias("n_intersect"),
    ).orderBy("p_partkey")


@query(
    "expr_map_construction",
    oracle="""
    SELECT o_orderkey,
           'prio,stat'                             AS ks,
           o_orderpriority || ',' || o_orderstatus AS vs,
           o_orderpriority || '|p'                 AS zip_prio,
           o_orderstatus || '|s'                   AS zip_stat,
           CAST(NULL AS VARCHAR)                   AS zip_missing,
           CAST(1 AS INT)                          AS n_filtered,
           upper(o_orderstatus)                    AS stat_upper,
           CAST(3 AS INT)                          AS n_concat
    FROM orders
    WHERE o_orderkey <= 2000
    ORDER BY o_orderkey
    """,
    notes=(
        "map CONSTRUCTION + higher-order map surface, completing the "
        "r17 map matrix under the driver-hashable discipline: "
        "str_to_map parse, map_zip_with merge, map_filter, "
        "transform_values, map_concat — every output reduced to a "
        "scalar (CSV/lookup/size). The oracle recomputes the expected "
        "values DIRECTLY from the base columns (an independent ground "
        "truth: a mis-parse in str_to_map or a wrong zip lambda shows "
        "up as a value mismatch, not as a mirrored bug)"
    ),
)
def expr_map_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    s = F.concat(
        F.lit("prio:"), F.col("o_orderpriority"),
        F.lit(",stat:"), F.col("o_orderstatus"),
    )
    m1 = F.str_to_map(s, F.lit(","), F.lit(":"))
    m2 = F.map_from_arrays(
        F.array(F.lit("prio"), F.lit("stat")),
        F.array(F.lit("p"), F.lit("s")),
    )
    zipped = F.map_zip_with(m1, m2, lambda k, v1, v2: F.concat_ws("|", v1, v2))
    filtered = F.map_filter(m1, lambda k, v: k == F.lit("prio"))
    upped = F.transform_values(m1, lambda k, v: F.upper(v))
    catted = F.map_concat(m1, F.create_map(F.lit("extra"), F.lit("z")))
    return o.select(
        "o_orderkey",
        F.array_join(F.map_keys(m1), ",").alias("ks"),
        F.array_join(F.map_values(m1), ",").alias("vs"),
        F.try_element_at(zipped, F.lit("prio")).alias("zip_prio"),
        F.try_element_at(zipped, F.lit("stat")).alias("zip_stat"),
        F.try_element_at(zipped, F.lit("nope")).alias("zip_missing"),
        F.size(filtered).alias("n_filtered"),
        F.try_element_at(upped, F.lit("stat")).alias("stat_upper"),
        F.size(catted).alias("n_concat"),
    ).orderBy("o_orderkey")
