"""Corpus-level training-data operators (EXT suite, round 2).

Four operators a large-scale LLM-data pipeline runs over a document
corpus, all JVM-side DataFrame work (no Python UDFs):

- TF-IDF top terms per document — term-frequency and document-frequency
  aggregates joined through a broadcast vocabulary table. The score is
  the rational variant tf·N/df (one IEEE-exact integer-product division)
  rather than tf·ln(N/df): ln() is implementation-defined in the last
  ulp across engines, division is correctly-rounded everywhere, so the
  oracle comparison is bit-exact. Rankings are identical (ln is
  monotone in N/df).
- Gopher-style quality gates — per-document boolean filter flags
  (token-count bounds, mean-word-length bounds, stopword presence)
  after Rae et al. 2021 §A.1 (arXiv:2112.11446).
- Rolling 7-day per-user activity — event-time RANGE window (seconds)
  for time-decayed per-entity features.
- Train/eval decontamination — n-gram overlap join between an eval
  slice and the train corpus: shingle both sides, equi-join on the
  shingle, count distinct shared shingles per (train, eval) pair.
  Linear in Σ df(shingle)·eval-side hits, NOT corpus-quadratic: the
  eval side is tiny by construction (that is the real-world shape).

Scale notes per operator in the docstrings below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sparketl.io import load_table, spread
from sparketl.operators.dedup import shingles
from sparketl.operators.text import STOPWORDS

# --------------------------------------------------------------- TF-IDF


def tfidf_topk(docs: DataFrame, k: int = 3, doc_filter=None) -> DataFrame:
    """Top-k terms per doc by tf·N/df.

    Plan shape: one shuffle for the (doc, token) tf aggregate (only the
    filtered docs), one for the vocabulary df aggregate (full corpus,
    but partial-aggregated map-side to vocab size), then a broadcast
    join — at 100 TB the vocabulary table is MBs while the corpus is
    the scan, so nothing quadratic or corpus-sized ever shuffles twice."""
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    dfreq = (
        toks.distinct().groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    )
    # Corpus size N as a driver-side scalar folded into the expression:
    # a 1-row join (even broadcast) de-sugars to a BroadcastNestedLoop
    # under constant folding, while count() on parquet is a
    # footer-metadata-only job — so the literal gives the cleanest plan
    # (pure hash join + codegen'd division, nothing corpus-sized moves).
    n_docs = docs.count()
    tf_side = toks if doc_filter is None else toks.filter(doc_filter)
    tf = tf_side.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.join(F.broadcast(dfreq), "token").withColumn(
        "score", (F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df")
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "token", "tf", "df", "score")
    )


def q_ext_10_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return tfidf_topk(d, k=3, doc_filter=F.col("doc_id") < 50).orderBy(
        "doc_id", "rank"
    )


# ------------------------------------------------------- Gopher quality


def gopher_flags(docs: DataFrame) -> DataFrame:
    """Per-doc boolean quality gates (Gopher rules §A.1 subset).

    Pure per-row expressions inside whole-stage codegen — a map over
    the scan, no shuffle at all; at 100 TB this runs at read speed."""
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_tokens_d = n_tokens.cast("double")
    mean_wl = (F.length("text") - (n_tokens - 1)).cast("double") / n_tokens_d
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = F.expr(f"size(filter(split(text, ' '), x -> x IN ({sw})))")
    flag_len = (n_tokens >= 10) & (n_tokens <= 500)
    flag_wl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    flag_stop = n_stop.cast("double") / n_tokens_d >= 0.01
    return docs.select(
        "doc_id",
        "lang",
        flag_len.alias("flag_len"),
        flag_wl.alias("flag_word_len"),
        flag_stop.alias("flag_stopwords"),
        (flag_len & flag_wl & flag_stop).alias("passes"),
    )


def q_ext_04_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return gopher_flags(d).orderBy("doc_id")


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Within-document repetition: duplicate 2-gram fraction (the
    Gopher repetition rules' core signal). Pure array expressions —
    map-only, codegen, no shuffle. Docs under 2 tokens are dropped
    (no 2-gram exists)."""
    tk = F.split(F.col("text"), " ")
    base = docs.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= 2)
    grams = F.expr(
        "transform(sequence(0, size(tk) - 2),"
        " i -> concat(element_at(tk, i + 1), ' ', element_at(tk, i + 2)))"
    )
    g = base.select("doc_id", grams.alias("grams"))
    n_total = F.size("grams").cast("long")
    n_distinct = F.size(F.array_distinct("grams")).cast("long")
    dup_frac = F.lit(1.0) - n_distinct.cast("double") / n_total.cast("double")
    return g.select(
        "doc_id",
        n_total.alias("n_2grams"),
        n_distinct.alias("n_distinct"),
        dup_frac.alias("dup_frac"),
        (dup_frac <= 0.9).alias("flag_repetition"),
    )


def q_ext_04_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return repetition_stats(d).orderBy("doc_id")


# ------------------------------------------------------- rolling window


def rolling_window(
    events: DataFrame, days: int = 7, value_col: str = "value"
) -> DataFrame:
    """Per-user rolling event count + exact value total over the
    trailing ``days`` window (event-time RANGE frame on epoch seconds).

    One shuffle on user_id; the frame is evaluated with a sliding
    aggregate, not a self-join — linear in events. Skewed users are the
    scale risk; per-user event counts are bounded by the app domain
    (and AQE skew handling splits stragglers)."""
    win_s = days * 86400
    base = events.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.expr("unix_micros(ts) div 1000000").alias("ts_s"),
        F.col(value_col).cast("decimal(12,2)").alias("v"),
    )
    w = W.partitionBy("user_id").orderBy("ts_s").rangeBetween(-win_s, 0)
    return base.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("roll_n"),
        F.sum("v").over(w).cast("double").alias("roll_value"),
    )


def q_ext_11_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return rolling_window(e, days=7).orderBy("user_id", "ts_us", "event_id")


# PII patterns kept to syntax shared by Java regex (Spark) and RE2
# (DuckDB) so the oracle comparison is engine-exact.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_SSN = r"\d{3}-\d{2}-\d{4}"
PII_PHONE = r"\d{3}[-.]\d{3}[-.]\d{4}"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII counts + redacted text (emails / SSNs / phones →
    typed placeholders). Map-only regexp work inside codegen — at
    100 TB this is a scan-speed pass, the standard pre-training scrub.
    SSN redacts before phone: the two number shapes must not overlap."""
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), PII_EMAIL, "[EMAIL]"),
            PII_SSN,
            "[SSN]",
        ),
        PII_PHONE,
        "[PHONE]",
    )
    n_emails = F.regexp_count(F.col(text_col), F.lit(PII_EMAIL))
    n_ssns = F.regexp_count(F.col(text_col), F.lit(PII_SSN))
    n_phones = F.regexp_count(
        F.regexp_replace(F.col(text_col), PII_SSN, "[SSN]"), F.lit(PII_PHONE)
    )
    return docs.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_ssns.cast("long").alias("n_ssns"),
        n_phones.cast("long").alias("n_phones"),
        ((n_emails + n_ssns + n_phones) > 0).alias("has_pii"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


def q_ext_13_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return pii_scrub(d).orderBy("doc_id")


# ----------------------------------------------------- decontamination


def decontaminate_overlap(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_shared: int = 3,
) -> DataFrame:
    """(train_doc_id, eval_doc_id, n_shared) for pairs sharing at least
    ``min_shared`` distinct word n-grams — the standard benchmark-
    contamination sweep before training.

    Both sides shingle (map-only), then one equi-join on the shingle
    string: work is Σ over shingles of train_df·eval_df, and since the
    eval side is benchmark-sized the join is effectively a broadcast
    probe of the train corpus — no all-pairs comparison anywhere."""
    t = shingles(train, n=n).select(
        F.col("doc_id").alias("train_doc_id"), F.explode("sh").alias("shingle")
    )
    e = shingles(eval_docs, n=n).select(
        F.col("doc_id").alias("eval_doc_id"), F.explode("sh").alias("shingle")
    )
    return (
        t.join(F.broadcast(e), "shingle")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate_by_flag(
    docs: DataFrame,
    flag_col: str = "_is_eval",
    n: int = 3,
    min_shared: int = 3,
) -> DataFrame:
    """Single-scan variant of :func:`decontaminate_overlap`: shingle the
    whole corpus ONCE (the eval flag rides along), cache the exploded
    shingles, and split train/eval from the cache — halves the scan +
    shingle work versus filtering the corpus twice. At cluster scale the
    cached intermediate would be a persisted shingle table partitioned
    by shingle hash."""
    sh = (
        shingles(docs, n=n, keep=(flag_col,))
        .select("doc_id", flag_col, F.explode("sh").alias("shingle"))
        .cache()
    )
    t = sh.filter(~F.col(flag_col)).select(
        F.col("doc_id").alias("train_doc_id"), "shingle"
    )
    e = sh.filter(F.col(flag_col)).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    return (
        t.join(F.broadcast(e), "shingle")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def q_ext_12_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "_is_eval", F.col("source") == "src0"
    )
    return decontaminate_by_flag(d, "_is_eval", n=3, min_shared=3).orderBy(
        "train_doc_id", "eval_doc_id"
    )
