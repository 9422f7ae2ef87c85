"""Relational operator catalog — SURVEY.md §2 re-expressed over the
driver testdata tables, each with a DuckDB oracle SQL twin.

Every entry is registered as ``name → (spark_fn, oracle_sql)``:
``spark_fn(spark, sf_dir) -> DataFrame`` builds the idiomatic-Spark plan;
``oracle_sql`` is independent ANSI SQL DuckDB runs on the same parquet.
Column names/types are aligned on both sides (the driver's value-hash
sorts columns by name); floating aggregates are rounded on both sides to
absorb summation-order differences.

Operator ids in the docstrings refer to SURVEY.md §2 rows, which in turn
cite /root/reference/ file:line for the behavior being mirrored.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import CATALOG, QueryDef, load, register, spread_scan  # noqa: F401 (re-export)


# =====================================================================
# §2.1 scans / sources / sinks
# =====================================================================


@register(
    "s1_scan_project_filter",
    """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE n_chars > 200 AND lang <> 'zh'
    """,
    "S1: pruned/pushed-down scan (projection + predicate reach parquet)",
)
def s1_scan_project_filter(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .filter((F.col("n_chars") > 200) & (F.col("lang") != "zh"))
    )


@register(
    "s3_gdrive_url_rewrite",
    """
    SELECT doc_id,
           'https://drive.google.com/uc?export=download&id=f' ||
             CAST(doc_id AS VARCHAR) AS direct_url,
           '/image/' || regexp_extract('/tmp/uploads/img_' ||
             CAST(doc_id AS VARCHAR) || '.png', '([^/]+)$', 1) AS url
    FROM documents WHERE doc_id % 3 = 0
    """,
    "S3+P4: drive.google.com/file/d/<id> → uc?export=download "
    "(app.py:362-376) and img.url = '/image/' + basename(path) "
    "(app.py:902-921) — both URL-derivation ops, one scan",
)
def s3_gdrive_url_rewrite(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    gurl = F.concat(
        F.lit("https://drive.google.com/file/d/f"),
        F.col("doc_id").cast("string"),
        F.lit("/view"),
    )
    file_id = F.regexp_extract(gurl, r"/file/d/([^/]+)", 1)
    path = F.concat(
        F.lit("/tmp/uploads/img_"), F.col("doc_id").cast("string"), F.lit(".png")
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://drive.google.com/uc?export=download&id="), file_id
        ).alias("direct_url"),
        F.concat(F.lit("/image/"), F.element_at(F.split(path, "/"), -1)).alias("url"),
    )


@register(
    "s9_json_projection",
    """
    SELECT doc_id,
           '{"doc_id":' || CAST(doc_id AS VARCHAR) || ',"lang":"' || lang || '"}'
             AS meta_json,
           list_aggr(list_transform(string_split(text, ' ')[1:3], w -> upper(w)),
                     'string_agg', '|') AS head_upper
    FROM documents WHERE doc_id < 100
    """,
    "S9+P2: payload-dropping JSON metadata projection (app.py:829-841) + "
    "array-of-struct transform() projection (app.py:831-838)",
)
def s9_json_projection(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    head = F.slice(F.split("text", " "), 1, 3)
    return docs.select(
        "doc_id",
        F.to_json(F.struct(F.col("doc_id"), F.col("lang"))).alias("meta_json"),
        F.array_join(F.transform(head, lambda w: F.upper(w)), "|").alias("head_upper"),
    )


# =====================================================================
# §2.2 projections / filters
# =====================================================================


@register(
    "f1_extension_allowlist",
    """
    WITH named AS (
      SELECT doc_id, text,
             'doc_' || CAST(doc_id AS VARCHAR) ||
             CASE doc_id % 5 WHEN 0 THEN '.pdf' WHEN 1 THEN '.PNG'
                  WHEN 2 THEN '.jpg' WHEN 3 THEN '.txt' ELSE '.docx' END AS fname
      FROM documents)
    SELECT doc_id, fname,
           lower(regexp_extract(fname, '\\.([^.]+)$', 1)) AS ext,
           CASE WHEN doc_id % 5 = 4 THEN
             CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS INT)
           END AS docx_n_paras,
           CASE WHEN doc_id % 5 = 4 THEN
             array_to_string(list_filter(string_split(text, ' '), w -> w <> ''),
                             chr(10))
           END AS docx_text
    FROM named
    WHERE lower(regexp_extract(fname, '\\.([^.]+)$', 1))
          IN ('pdf','png','jpg','jpeg','docx')
    """,
    "F1+X8+S4(docx): extension allow-list on lowercase rsplit('.',1)[1] "
    "(app.py:54-57) — the split itself is the X8 op, emitted as a column. "
    "Allow-listed .docx rows additionally carry a REAL DOCX extraction: "
    "the engine builds a genuine DOCX (ZIP + WordprocessingML, one "
    "paragraph per word split into two runs), byte-parses it back "
    "(functions/docx.py), and the oracle predicts the extracted "
    "paragraphs with pure SQL — the same build→decode value-oracle "
    "trick the PNG/JPEG media rows use. The reference allow-lists docx "
    "(app.py:46) but its OCR API never extracts it (its own TODO); the "
    "engine makes the format real.",
)
def f1_extension_allowlist(spark, sf_dir):
    # the docx build->parse roundtrip is the map stage: spread the
    # one-split documents scan (guide §2.5)
    docs = spread_scan(load(spark, sf_dir, "documents"))
    fname = F.concat(
        F.lit("doc_"),
        F.col("doc_id").cast("string"),
        F.element_at(
            F.array(F.lit(".pdf"), F.lit(".PNG"), F.lit(".jpg"), F.lit(".txt"), F.lit(".docx")),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ),
    )
    from .extract import docx_roundtrip_udf

    rt = docx_roundtrip_udf(F.when(F.col("doc_id") % 5 == 4, F.col("text")))
    named = docs.select("doc_id", fname.alias("fname"), rt.alias("_rt"))
    ext = F.lower(F.substring_index(F.col("fname"), ".", -1))
    return (
        named.withColumn("ext", ext)
        .filter(ext.isin("pdf", "png", "jpg", "jpeg", "docx"))
        .select(
            "doc_id", "fname", "ext",
            F.col("_rt.n_paras").alias("docx_n_paras"),
            F.col("_rt.text").alias("docx_text"),
        )
    )


@register(
    "f2_size_guard",
    """
    SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes,
           coalesce(try_cast(substring(text, 1, 2) AS INT), 0) AS as_int,
           coalesce(try_cast(lang AS DOUBLE), 0.0) AS as_double
    FROM documents WHERE strlen(text) <= 400
    """,
    "F2+Y9: max-size guard (app.py:44,393-395; 50 MB → 400 B stand-in) + "
    "type-tag cast with swallow-to-default (settings_manager.py:376-391)",
)
def f2_size_guard(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("int").alias("n_bytes"),
        F.coalesce(
            F.expr("try_cast(substring(text, 1, 2) AS INT)"), F.lit(0)
        ).alias("as_int"),
        F.coalesce(F.expr("try_cast(lang AS DOUBLE)"), F.lit(0.0)).alias("as_double"),
    ).filter(F.octet_length("text") <= 400)


@register(
    "f3_small_payload_flags",
    """
    SELECT lang,
           CAST(count(*) FILTER (WHERE length(text) < 100) AS BIGINT) AS n_small,
           CAST(count(*) AS BIGINT) AS n_total
    FROM documents GROUP BY lang
    """,
    "F3/A3: suspicious-size census (app.py:156-158,204-206 thresholds)",
)
def f3_small_payload_flags(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count_if(F.length("text") < 100).alias("n_small"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


@register(
    "f7_has_items_predicate",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 6))
                AS INT) AS n_long_words
    FROM documents
    WHERE len(list_filter(string_split(text, ' '), w -> length(w) > 6)) > 0
      AND doc_id % 2 = 0
    """,
    "F7: size(array)>0 / exists() predicate over an array column (app.py:540,689)",
)
def f7_has_items_predicate(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    long_words = F.filter(F.split("text", " "), lambda w: F.length(w) > 6)
    return docs.select(
        "doc_id", F.size(long_words).cast("int").alias("n_long_words")
    ).filter(F.size(long_words) > 0)


# =====================================================================
# §2.3 joins
# =====================================================================


@register(
    "j1_positional_join",
    """
    WITH clicks AS (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
      FROM events WHERE event_type = 'click'),
    errors AS (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos
      FROM events WHERE event_type = 'error')
    SELECT c.user_id, c.pos, c.event_id AS click_id,
           e.event_id AS adopted_error_id,
           CASE WHEN e.event_id IS NOT NULL THEN 1 ELSE 0 END AS matched
    FROM clicks c LEFT JOIN errors e ON c.user_id = e.user_id AND c.pos = e.pos
    """,
    "J1+J2: k-th ↔ k-th positional pairing via row_number, left-outer "
    "form — j-th empty-b64 image adopts j-th fallback image, unmatched "
    "keeps NULL (app.py:92-112,674-681; warning at :681). The inner-join "
    "variant is the matched=1 subset (value-verified via the flag)",
)
def j1_positional_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "event_id", F.row_number().over(w).alias("pos"))
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select("user_id", "event_id", F.row_number().over(w).alias("pos"))
    )
    return clicks.alias("c").join(errors.alias("e"), ["user_id", "pos"], "left").select(
        "user_id",
        "pos",
        F.col("c.event_id").alias("click_id"),
        F.col("e.event_id").alias("adopted_error_id"),
        F.when(F.col("e.event_id").isNotNull(), 1).otherwise(0).alias("matched"),
    )


@register(
    "j3_equi_join_chain",
    """
    SELECT r.r_name, n.n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(o.o_totalprice) AS DOUBLE), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY r.r_name, n.n_name
    """,
    "J3/J4/J7: equi-join chain, small dims broadcast (settings lookup analog)",
)
def j3_equi_join_chain(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "j5_dict_lookup_join",
    """
    WITH dim(event_type, weight) AS (VALUES ('click', 1.0), ('signup', 5.0),
                                            ('error', -2.0), ('purchase', 10.0))
    SELECT e.event_type,
           round(CAST(sum(e.value * coalesce(d.weight, 0.0)) AS DOUBLE), 2)
             AS weighted
    FROM events e LEFT JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
    "J5/J7: id→value dict join, broadcast hash (main.py:45-48)",
)
def j5_dict_lookup_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", 1.0), ("signup", 5.0), ("error", -2.0), ("purchase", 10.0)],
        "event_type string, weight double",
    )
    return (
        ev.join(F.broadcast(dim), "event_type", "left")
        .groupBy("event_type")
        .agg(
            F.round(F.sum(F.col("value") * F.coalesce(F.col("weight"), F.lit(0.0))), 2)
            .alias("weighted")
        )
    )


@register(
    "j6_semi_anti_membership",
    """
    SELECT c.c_custkey, c.c_name AS val, 'no_orders' AS tag FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c.c_custkey, c.c_mktsegment AS val, 'has_big_order' AS tag
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 200000)
    """,
    "J6+J7/U3: INSERT OR IGNORE ≡ left_anti (init_db.py:108-113) and "
    "keyed EXISTS lookup ≡ left_semi (settings_manager.py:49-53) — "
    "union-tagged so both join strategies are value-verified in one plan",
)
def j6_semi_anti_membership(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    absent = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.col("c_name").alias("val"), F.lit("no_orders").alias("tag")
    )
    big = o.filter(F.col("o_totalprice") > 200000)
    present = c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey",
        F.col("c_mktsegment").alias("val"),
        F.lit("has_big_order").alias("tag"),
    )
    return absent.unionByName(present)


# =====================================================================
# §2.4 aggregations
# =====================================================================


@register(
    "a1_counts_per_group",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2)
             AS revenue,
           round(CAST(avg(l_discount) AS DOUBLE), 6) AS avg_disc
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    "A1/A5: partial+final hash agg (TPC-H Q1 shape; app.py:611-630 analog)",
)
def a1_counts_per_group(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@register(
    "a6_group_category_sorted_set",
    """
    SELECT lang,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents GROUP BY lang
    """,
    "A6: settings grouped {category:{key:...}} (settings_manager.py:126-150)",
)
def a6_group_category_sorted_set(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@register(
    "a7_refcount_mismatch",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, 'data')) AS INT) AS n_data,
           CAST(len(regexp_extract_all(text, 'spark')) AS INT) AS n_spark
    FROM documents
    WHERE len(regexp_extract_all(text, 'data'))
          <> len(regexp_extract_all(text, 'spark'))
      AND doc_id < 300
    """,
    "A7/X2: regex-count conformance mismatch (app.py:163-166)",
)
def a7_refcount_mismatch(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    n_data = F.size(F.regexp_extract_all("text", F.lit("data"), 0)).cast("int")
    n_spark = F.size(F.regexp_extract_all("text", F.lit("spark"), 0)).cast("int")
    return docs.select(
        "doc_id", n_data.alias("n_data"), n_spark.alias("n_spark")
    ).filter(F.col("n_data") != F.col("n_spark"))


@register(
    "a8_rollup_totals",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "beyond-reference: ROLLUP grouping sets (SURVEY §2.4 notes none in ref)",
)
def a8_rollup_totals(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
        )
    )


# =====================================================================
# §2.5 windows / ordering  +  §2.6 sorts / top-k
# =====================================================================


@register(
    "w1_ordered_concat_per_group",
    """
    SELECT user_id,
           string_agg(event_type, '|' ORDER BY ts, event_id) AS event_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE event_type <> 'error') AS BIGINT) AS valid,
           round(CASE WHEN count(*) > 0
                 THEN CAST(count(*) FILTER (WHERE event_type <> 'error') AS DOUBLE)
                      / count(*) * 100 ELSE 0.0 END, 4) AS success_rate
    FROM events GROUP BY user_id
    """,
    "W1+A2/Y5 (flagship shape): ordered concat per group — the "
    "stable-turn-order op (app.py:816-822; ours: collect_list→array_sort→"
    "array_join) — plus valid/total*100 with zero guard in the same agg "
    "(app.py:142-177, rate :176)",
)
def w1_ordered_concat_per_group(spark, sf_dir):
    # NOT spread_scan: collect_list partials don't shrink rows, so a
    # pre-spread is a pure extra shuffle of the full table (measured
    # 1.1s -> 2.0s at sf1.0); the groupBy exchange parallelizes the
    # heavy reduce side on its own
    ev = load(spark, sf_dir, "events")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
    )
    valid = F.count_if(F.col("event_type") != "error")
    total = F.count(F.lit(1))
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(ordered, lambda x: x["event_type"]), "|"
        ).alias("event_seq"),
        total.alias("n_events"),
        valid.alias("valid"),
        F.round(
            F.when(total > 0, valid.cast("double") / total * 100).otherwise(0.0), 4
        ).alias("success_rate"),
    )


#: budget (in exact integer cents of `value`) for the w4 pack_id column
#: — the offset-binning demo of operators/assemble.py pack_turns
_PACK_BUDGET_CENTS = 50_000


@register(
    "w4_frame_running_sum",
    f"""
    WITH c AS (
      SELECT event_id, user_id, ts, value,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events)
    SELECT event_id, user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos,
           round(CAST(sum(value) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
             AS running_value,
           round(CAST(lag(value, 1, 0.0) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS DOUBLE), 2) AS prev_value,
           CAST(floor((sum(cents) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cents)
                 / {_PACK_BUDGET_CENTS}.0) AS INT) AS pack_id
    FROM c
    """,
    "W2+W4: row_number position within sequence (app.py:92,674 loop index "
    "k/j) + frame specs + lag (SURVEY §2.5 W4 extension) in one window "
    "— plus offset-binning pack_id (operators/assemble.py pack_turns "
    "semantics over an integer-exact cents cumsum: context-window "
    "packing for training slices)",
)
def w4_frame_running_sum(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    # exact integer cumsum (values carry 2dp; round kills float noise
    # BEFORE summing so both engines bin identically at pack boundaries)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("pos"),
        F.round(F.sum("value").over(wcum), 2).alias("running_value"),
        F.round(F.lag("value", 1, 0.0).over(w), 2).alias("prev_value"),
        F.floor((F.sum(cents).over(wcum) - cents) / F.lit(_PACK_BUDGET_CENTS))
        .cast("int")
        .alias("pack_id"),
    )


@register(
    "o1_multikey_sort_topk",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    "O1/O3: multi-key sort + LIMIT → TakeOrderedAndProject "
    "(settings_manager.py:266-267,456)",
)
def o1_multikey_sort_topk(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(100)
    )


@register(
    "w3_ordered_audit_scan",
    """
    SELECT event_id, user_id, event_type FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 100
    """,
    "W3/O3: ORDER BY changed_at DESC LIMIT (settings_manager.py:462-473)",
)
def w3_ordered_audit_scan(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(100)
    )


# =====================================================================
# §2.7 set operations
# =====================================================================


@register(
    "u1_union_tagged_sources",
    """
    SELECT 'customer' AS src, c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n
    FROM customer GROUP BY c_nationkey
    UNION ALL
    SELECT 'supplier' AS src, s_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n
    FROM supplier GROUP BY s_nationkey
    UNION ALL
    SELECT 'both' AS src, nationkey, CAST(NULL AS BIGINT) AS n FROM
      (SELECT c_nationkey AS nationkey FROM customer
       INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS src, nationkey, CAST(NULL AS BIGINT) AS n FROM
      (SELECT c_nationkey AS nationkey FROM customer
       EXCEPT SELECT s_nationkey FROM supplier)
    """,
    "U1+U4: union of two image sources with source tag (app.py:663-665) + "
    "INTERSECT / EXCEPT membership rows (SURVEY §2.7; set-semantics "
    "EXCEPT = distinct().subtract() — Spark exceptAll is bag semantics)",
)
def u1_union_tagged_sources(spark, sf_dir):
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("customer").alias("src"), "nationkey", "n")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("supplier").alias("src"), "nationkey", "n")
    )
    ckeys = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    skeys = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    null_n = F.lit(None).cast("long").alias("n")
    both = ckeys.intersect(skeys).select(F.lit("both").alias("src"), "nationkey", null_n)
    only = (
        ckeys.distinct()
        .subtract(skeys.distinct())
        .select(F.lit("customer_only").alias("src"), "nationkey", null_n)
    )
    return c.unionByName(s).unionByName(both).unionByName(only)


@register(
    "u2_upsert_merge",
    """
    WITH updates AS (
      SELECT c_custkey, c_acctbal * 2 AS new_bal FROM customer
      WHERE c_custkey % 10 = 0)
    SELECT c.c_custkey,
           round(coalesce(u.new_bal, c.c_acctbal), 2) AS acctbal,
           CASE WHEN u.c_custkey IS NOT NULL THEN 'updated' ELSE 'kept' END
             AS status
    FROM customer c LEFT JOIN updates u ON c.c_custkey = u.c_custkey
    """,
    "U2/J6: INSERT OR REPLACE upsert ≡ MERGE (settings_manager.py:80-84); "
    "relational form: left join + coalesce",
)
def u2_upsert_merge(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    updates = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", (F.col("c_acctbal") * 2).alias("new_bal"))
    )
    return (
        c.alias("c")
        .join(updates.alias("u"), "c_custkey", "left")
        .select(
            "c_custkey",
            F.round(F.coalesce("new_bal", "c_acctbal"), 2).alias("acctbal"),
            F.when(F.col("new_bal").isNotNull(), "updated")
            .otherwise("kept")
            .alias("status"),
        )
    )


# =====================================================================
# §2.8 scalar string / regex / encoding
# =====================================================================


@register(
    "x1_regex_extract_all",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS INT) AS n_a_words,
           regexp_extract(text, '([a-z]+a[a-z]*)', 1) AS first_a_word
    FROM documents WHERE doc_id < 250
    """,
    "X1: regexp all-matches extraction (app.py:121-122)",
)
def x1_regex_extract_all(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+a[a-z]*"), 0))
        .cast("int")
        .alias("n_a_words"),
        F.regexp_extract("text", "([a-z]+a[a-z]*)", 1).alias("first_a_word"),
    )


@register(
    "x5_translate_normalize",
    """
    SELECT doc_id,
           replace(replace(source || '.' || lang, '.', '_'), '/', '_') AS norm_id,
           'page_' || CAST(doc_id % 10 AS VARCHAR) || '_img_' || source || '.png'
             AS filename
    FROM documents WHERE doc_id < 150
    """,
    "X5+X6: id normalization ./ → _ (app.py:127) via translate, plus "
    "f-string filename synthesis (app.py:128,585) via format_string",
)
def x5_translate_normalize(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    raw = F.concat(F.col("source"), F.lit("."), F.col("lang"))
    return docs.select(
        "doc_id",
        F.translate(raw, "./", "__").alias("norm_id"),
        F.format_string(
            "page_%d_img_%s.png", (F.col("doc_id") % 10).cast("int"), F.col("source")
        ).alias("filename"),
    )


@register(
    "x9_mime_sniff",
    """
    SELECT CASE doc_id % 4 WHEN 0 THEN 'application/pdf' WHEN 1 THEN 'image/png'
                WHEN 2 THEN 'image/jpeg' ELSE 'application/octet-stream' END
             AS mime,
           CAST(count(*) AS BIGINT) AS n
    FROM documents GROUP BY 1
    """,
    "X9: MIME by extension lookup chain (app.py:59-62,191-198)",
)
def x9_mime_sniff(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    mime = (
        F.when(F.col("doc_id") % 4 == 0, "application/pdf")
        .when(F.col("doc_id") % 4 == 1, "image/png")
        .when(F.col("doc_id") % 4 == 2, "image/jpeg")
        .otherwise("application/octet-stream")
    )
    return docs.groupBy(mime.alias("mime")).agg(F.count(F.lit(1)).alias("n"))


@register(
    "x10_base64_roundtrip",
    """
    WITH uris AS (
      SELECT doc_id,
             to_base64(encode(substring(text, 1, 24))) AS b64,
             'data:image/png;base64,' ||
               to_base64(encode(substring(text, 1, 24))) AS uri
      FROM documents WHERE doc_id < 100)
    SELECT doc_id, b64,
           decode(from_base64(b64)) AS roundtrip,
           string_split(string_split(uri, ';')[1], ':')[2] AS mime,
           string_split(uri, 'base64,')[2] AS payload
    FROM uris
    """,
    "X10+X11: base64 encode/decode roundtrip (app.py:186-201,751-752) + "
    "data-URI header parse of the same payload (app.py:222-230)",
)
def x10_base64_roundtrip(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    head = F.substring("text", 1, 24)
    b64 = F.base64(head.cast("binary"))
    uri = F.concat(F.lit("data:image/png;base64,"), b64)
    return docs.select(
        "doc_id",
        b64.alias("b64"),
        F.unbase64(b64).cast("string").alias("roundtrip"),
        F.element_at(F.split(F.element_at(F.split(uri, ";"), 1), ":"), 2).alias("mime"),
        F.element_at(F.split(uri, "base64,"), 2).alias("payload"),
    )


@register(
    "x12_url_parse",
    """
    WITH urls AS (
      SELECT doc_id, lang,
             'https://example.com/files/doc%20' || CAST(doc_id AS VARCHAR)
               || '.pdf?v=2' AS url
      FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1) AS path,
           regexp_extract(regexp_extract(url, '^[a-z]+://[^/]+(/[^?#]*)', 1),
                          '([^/]+)$', 1) AS basename,
           sha256('doc:' || CAST(doc_id AS VARCHAR) || ':' || lang) AS stable_id
    FROM urls
    """,
    "X12+X13: urlparse(url).path + basename (app.py:868,1038) + "
    "deterministic sha2 ids replacing os.urandom names (SURVEY §2.8)",
)
def x12_url_parse(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    url = F.concat(
        F.lit("https://example.com/files/doc%20"),
        F.col("doc_id").cast("string"),
        F.lit(".pdf?v=2"),
    )
    path = F.parse_url(url, F.lit("PATH"))
    key = F.concat_ws(":", F.lit("doc"), F.col("doc_id"), F.col("lang"))
    return docs.select(
        "doc_id",
        path.alias("path"),
        F.element_at(F.split(path, "/"), -1).alias("basename"),
        F.sha2(key, 256).alias("stable_id"),
    )


# =====================================================================
# §2.9 scalar date / math / JSON
# =====================================================================


@register(
    "y2_iso_timestamp_format",
    """
    SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_ts,
           round(greatest(0.5, least(3.0, value / 100)), 4) AS zoom
    FROM events WHERE event_id < 300
    """,
    "Y2+Y7: ISO timestamp string (settings_manager.py:409) + "
    "Math.max(0.5, Math.min(3.0, z)) clamp (compare.html:251)",
)
def y2_iso_timestamp_format(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_ts"),
        F.round(F.greatest(F.lit(0.5), F.least(F.lit(3.0), F.col("value") / 100)), 4)
        .alias("zoom"),
    )


@register(
    "y3_interval_window",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_recent FROM events
    WHERE ts > TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 24 HOUR
    """,
    "Y3: 24h interval arithmetic (init_db.py:97 cache TTL)",
)
def y3_interval_window(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-01 00:00:00").cast("timestamp") + F.expr("INTERVAL 24 HOURS")
    return ev.filter(F.col("ts") > cutoff).agg(F.count(F.lit(1)).alias("n_recent"))


@register(
    "y4_bbox_arithmetic",
    """
    SELECT p_partkey,
           (p_size * 20 - p_size * 3) AS width,
           (p_size * 12 - p_size * 2) AS height,
           (p_size * 20 - p_size * 3) * (p_size * 12 - p_size * 2) AS area,
           '<svg width="' || CAST(p_size * 10 AS VARCHAR) || '" height="' ||
             CAST(p_size * 5 AS VARCHAR) || '"><text>' || p_name ||
             '</text></svg>' AS svg
    FROM part WHERE p_size > 25
    """,
    "Y4+S11/X14: bbox width/height by subtraction (app.py:563-564,580-581) "
    "+ templated SVG synthesis as a column expr (app.py:248-271)",
)
def y4_bbox_arithmetic(spark, sf_dir):
    p = load(spark, sf_dir, "part").filter(F.col("p_size") > 25)
    width = F.col("p_size") * 20 - F.col("p_size") * 3
    height = F.col("p_size") * 12 - F.col("p_size") * 2
    return p.select(
        "p_partkey",
        width.alias("width"),
        height.alias("height"),
        (width * height).alias("area"),
        F.format_string(
            '<svg width="%d" height="%d"><text>%s</text></svg>',
            F.col("p_size") * 10,
            F.col("p_size") * 5,
            F.col("p_name"),
        ).alias("svg"),
    )


@register(
    "y8_json_extract",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events GROUP BY event_type
    """,
    "Y8: JSON path extraction (settings profile_data; events.props)",
)
def y8_json_extract(spark, sf_dir):
    # per-row JSON parse over 1M events in ONE scan split: spread it
    ev = spread_scan(load(spark, sf_dir, "events"))
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.max(k).alias("max_k")
    )
