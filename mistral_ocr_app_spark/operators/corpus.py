"""Corpus-scale training-data operators: dedup, similarity search, text
analysis — the operations a 100 TB training-data pipeline needs beyond
the reference's own operator set (first-class per the build brief).

Oracle-able ops carry DuckDB SQL; hash-dependent ops (MinHash/LSH use
Spark's xxhash64) are rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .relational import load, register

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "it"]


# ------------------------------------------------------------ text stats ---


@register(
    "c1_token_count",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT)
             AS n_distinct_tokens
    FROM documents WHERE doc_id < 400
    """,
    "token counting (whitespace tokenizer) over documents",
)
def c1_token_count(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct_tokens"),
    )


@register(
    "c2_quality_score",
    f"""
    WITH feats AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             CAST(len(list_filter(string_split(text, ' '),
                  w -> list_contains({STOPWORDS!r}, w))) AS INT) AS n_stop,
             CAST(length(text) AS INT) AS n_chars
      FROM documents)
    SELECT doc_id, n_tokens,
           round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
           round(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS mean_token_len,
           CASE WHEN n_tokens >= 20
                 AND CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.05 AND 0.6
                THEN 1 ELSE 0 END AS quality_pass
    FROM feats WHERE doc_id < 400
    """,
    "quality scoring: stopword ratio + length heuristics (C4-style filters)",
)
def c2_quality_score(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    toks = F.split("text", " ")
    stop_arr = F.array([F.lit(w) for w in STOPWORDS])
    n_tokens = F.size(toks).cast("int")
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w))).cast("int")
    stop_ratio = n_stop.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(F.length("text").cast("double") / n_tokens, 4).alias("mean_token_len"),
        F.when((n_tokens >= 20) & stop_ratio.between(0.05, 0.6), 1)
        .otherwise(0)
        .alias("quality_pass"),
    )


@register(
    "c3_lang_id_ngram",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, 'th|he|in|er')) AS en_hits,
             len(regexp_extract_all(text, 'de|la|el|os')) AS es_hits
      FROM documents WHERE doc_id < 300)
    SELECT doc_id, lang,
           CASE WHEN en_hits >= es_hits THEN 'latin-en' ELSE 'latin-es' END
             AS guessed_family
    FROM scored
    """,
    "language-ID n-gram heuristic (bigram hit counting)",
)
def c3_lang_id_ngram(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    en = F.size(F.regexp_extract_all("text", F.lit("th|he|in|er"), 0))
    es = F.size(F.regexp_extract_all("text", F.lit("de|la|el|os"), 0))
    return docs.select(
        "doc_id",
        "lang",
        F.when(en >= es, "latin-en").otherwise("latin-es").alias("guessed_family"),
    )


# ----------------------------------------------------------------- dedup ---


@register(
    "d1_exact_dedup",
    """
    SELECT CAST(min(doc_id) AS BIGINT) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           sha256(text) AS text_hash
    FROM documents GROUP BY text HAVING count(*) >= 1
    """,
    "exact dedup: hash-groupBy on full text, canonical = min(doc_id)",
)
def d1_exact_dedup(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2("text", 256).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("canonical_id", "n_copies", "text_hash")
    )


@register(
    "d2_fingerprint_shingle",
    """
    SELECT fingerprint,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM (
      SELECT doc_id,
             sha256(list_aggr(string_split(lower(text), ' ')[1:5],
                    'string_agg', '§')) AS fingerprint
      FROM documents)
    GROUP BY fingerprint
    """,
    "document fingerprinting: leading-shingle hash → duplicate clusters",
)
def d2_fingerprint_shingle(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    head = F.slice(F.split(F.lower("text"), " "), 1, 5)
    fp = F.sha2(F.array_join(head, "§"), 256)
    return (
        docs.groupBy(fp.alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@register(
    "d3_ngram_jaccard_pairs",
    """
    WITH toks AS (
      SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 300)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.tok, b.tok))), 4) AS jaccard
    FROM toks a JOIN toks b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE) /
          len(list_distinct(list_concat(a.tok, b.tok))) >= 0.35
    """,
    "n-gram Jaccard near-dup: blocked self-join (block = source), token-set "
    "similarity; at scale the blocking key becomes the LSH band bucket",
)
def d3_ngram_jaccard_pairs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = docs.select(
        "doc_id", "source", F.array_distinct(F.split("text", " ")).alias("tok")
    )
    a, b = toks.alias("a"), toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.tok"), F.col("b.tok"))).cast("double")
    union = F.size(F.array_distinct(F.concat(F.col("a.tok"), F.col("b.tok"))))
    jac = inter / union
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jac >= 0.35)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


N_MINHASH = 16
LSH_BANDS = 4  # 4 rows per band


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """MinHash over whitespace shingles via xxhash64 with per-permutation
    seeds; all JVM-side column expressions (no Python)."""
    toks = F.array_distinct(F.split(F.lower("text"), " "))
    sig = F.array(
        *[
            F.array_min(
                F.transform(toks, lambda t, i=i: F.xxhash64(t, F.lit(i)))
            )
            for i in range(N_MINHASH)
        ]
    )
    return docs.select("doc_id", sig.alias("sig"))


@register(
    "d4_minhash_lsh_candidates",
    None,  # xxhash64 is Spark-specific — rows-only driver check
    "MinHash+LSH near-dup candidates: shingle→minhash→band→bucket join. "
    "Scale path for d3 (no quadratic self-join; shuffle on band buckets)",
)
def d4_minhash_lsh_candidates(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs)
    rows_per_band = N_MINHASH // LSH_BANDS
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b), *[F.element_at("sig", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


N_SIMHASH_BITS = 64
SIMHASH_BANDS = 4


def simhash_signs_expr():
    """SimHash signature as an array of 64 sign bits (0/1), all JVM-side.

    Random-hyperplane family: bit b = sign of Σ_tokens ±1, where the ±1
    is the sign of ``xxhash64(token, b)`` — 64 independent hash
    functions. (Spark's shiftleft/shiftright need literal shift amounts,
    so the signature stays an array instead of being packed into one
    int64 — arrays band/compare just as well.)"""
    toks = F.array_distinct(F.split(F.lower("text"), " "))
    return F.transform(
        F.sequence(F.lit(0), F.lit(N_SIMHASH_BITS - 1)),
        lambda b: F.when(
            F.aggregate(
                toks,
                F.lit(0),
                lambda acc, t: acc + F.when(F.xxhash64(t, b) > 0, 1).otherwise(-1),
            )
            > 0,
            1,
        ).otherwise(0),
    )


@register(
    "d5_simhash_bands",
    None,  # xxhash64-based — rows-only driver check
    "SimHash near-dup: 64-bit sign signature, 4×16-bit band buckets → "
    "candidate pairs whose signatures differ in ≤ 3 bits (hamming verify)",
)
def d5_simhash_bands(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    sigs = docs.select("doc_id", simhash_signs_expr().alias("sig"))
    rows = N_SIMHASH_BITS // SIMHASH_BANDS
    bands = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.slice("sig", b * rows + 1, rows))
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.size(
        F.filter(
            F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: x - y),
            lambda v: v != 0,
        )
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= 3)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()
    )


# ------------------------------------------------------ similarity search ---


def _cosine_expr(e1, e2):
    """Cosine in float64 throughout (elements cast before multiply) so the
    DuckDB oracle — also computing in DOUBLE — agrees to rounding."""
    dot = F.aggregate(
        F.zip_with(e1, e2, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n1 = F.sqrt(
        F.aggregate(e1, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    n2 = F.sqrt(
        F.aggregate(e2, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (n1 * n2)


@register(
    "e1_cosine_topk",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    pairs AS (
      SELECT e.vec_id, e.label,
             CAST(unnest(e.embedding) AS DOUBLE) AS x,
             CAST(unnest(q.qv) AS DOUBLE) AS y
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
    sims AS (
      SELECT vec_id, label,
             round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 3)
               AS cos_sim
      FROM pairs GROUP BY vec_id, label)
    SELECT vec_id, label, cos_sim FROM sims
    ORDER BY cos_sim DESC, vec_id ASC LIMIT 20
    """,
    "brute-force cosine top-k ANN baseline (F.zip_with/aggregate dot product)",
)
def e1_cosine_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cos = _cosine_expr(F.col("embedding"), F.col("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", F.round(cos, 3).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(20)
    )


@register(
    "e2_label_centroid_norm",
    """
    WITH dims AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS dim,
             unnest(embedding) AS v
      FROM embeddings),
    cent AS (
      SELECT label, dim, avg(v) AS c FROM dims GROUP BY label, dim)
    SELECT label, round(sqrt(sum(c * c)), 4) AS centroid_norm,
           CAST(count(*) AS BIGINT) AS n_dims
    FROM cent GROUP BY label
    """,
    "per-label centroid (IVF coarse-quantizer training step): "
    "posexplode → avg per (label, dim) → norm",
)
def e2_label_centroid_norm(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("dim0", "v")
    ).select("label", (F.col("dim0") + 1).alias("dim"), F.col("v").cast("double"))
    cent = dims.groupBy("label", "dim").agg(F.avg("v").alias("c"))
    return cent.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 4).alias("centroid_norm"),
        F.count(F.lit(1)).alias("n_dims"),
    )


@register(
    "d6_embedding_neardup",
    """
    WITH pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(unnest(a.embedding) AS DOUBLE) AS x,
             CAST(unnest(b.embedding) AS DOUBLE) AS y
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE a.vec_id < 400 AND b.vec_id < 400),
    sims AS (
      SELECT vec_a, vec_b,
             round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 3) AS cos_sim
      FROM pairs GROUP BY vec_a, vec_b)
    SELECT vec_a, vec_b, cos_sim FROM sims WHERE cos_sim >= 0.2
    """,
    "embedding-cosine near-dup pairs: label-blocked self-join (the LSH "
    "bucket stands in for label at scale), float64 cosine, thresholded",
)
def d6_embedding_neardup(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label"), F.col("embedding").alias("eb")
    )
    cos = F.round(_cosine_expr(F.col("ea"), F.col("eb")), 3)
    return (
        a.join(b, ["label"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.2)
    )


@register(
    "m1_media_features",
    None,  # decode stub is engine-side — rows-only driver check
    "multimodal: binary media column → decode/feature-extract via "
    "mapInPandas (real magic-byte sniff + PNG header parse; pixel decode "
    "stubbed deterministically — codecs absent in this container)",
)
def m1_media_features(spark, sf_dir):
    from .multimodal import extract_media_features, media_from_documents

    media = media_from_documents(load(spark, sf_dir, "documents"))
    return extract_media_features(media)


@register(
    "m2_video_frame_sample",
    None,
    "multimodal: frame sampling — 1 video row → n_frames/k frame rows "
    "(mapInPandas fan-out batch shape)",
)
def m2_video_frame_sample(spark, sf_dir):
    from .multimodal import media_from_documents, sample_video_frames

    media = media_from_documents(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    )
    return sample_video_frames(media, every_k=16)


@register(
    "e3_ivf_bucketed_ann",
    None,  # centroid assignment uses Spark float reduction order — rows-only
    "IVF-style ANN scale path: assign each vector to nearest of K seed "
    "centroids (vec_id 0..7 as seeds), search only the query's bucket",
)
def e3_ivf_bucketed_ann(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    seeds = (
        emb.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("seed_id"), F.col("embedding").alias("sv"))
    )
    cos = _cosine_expr(F.col("embedding"), F.col("sv"))
    assigned = (
        emb.crossJoin(F.broadcast(seeds))
        .select("vec_id", "label", "embedding", "seed_id", cos.alias("sim"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("seed_id"))
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk", "sim")
    )
    # query = vec_id 0; search only its bucket
    qbucket = assigned.filter(F.col("vec_id") == 0).select(
        F.col("seed_id").alias("qseed"), F.col("embedding").alias("qv")
    )
    cos2 = _cosine_expr(F.col("embedding"), F.col("qv"))
    return (
        assigned.join(
            F.broadcast(qbucket), assigned.seed_id == F.col("qseed")
        )
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "label", F.round(cos2, 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(20)
    )
