"""Text-analysis operators for training-data pipelines.

All pure column expressions (regexp/split/array HOFs) — JVM-side,
whole-stage-codegen, no Python in the hot path. Each scales linearly
with a single scan of `documents` and a final small aggregation where
applicable; nothing here shuffles the raw text except text_stats'
groupBy(lang) (5 groups, partial-agg'd map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kawa_spark.io import table, spread
from kawa_spark.registry import register

# language-marker stopwords used by the naive lang-id heuristic.
# Deliberately tiny + deterministic; both engines evaluate the same
# regexes so the heuristic is oracle-checkable.
LANG_MARKERS: dict[str, str] = {
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein)\b",
    "en": r"\b(the|and|is|of|to|in|that|for)\b",
    "es": r"\b(el|la|los|las|es|y|de|que|en)\b",
    "fr": r"\b(le|la|les|et|est|de|que|pour)\b",
    "zh": r"[一-鿿]",
}


@register(
    "text_stats",
    oracle="""
    SELECT
      lang,
      COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE)
        / COUNT(*) AS avg_tokens,
      MIN(n_chars) AS min_chars,
      MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (integer sums → exact)."""
    d = table(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    cnt = F.count(F.lit(1))
    return d.groupBy("lang").agg(
        cnt.alias("n_docs"),
        (F.sum("n_chars").cast("double") / cnt).alias("avg_chars"),
        (F.sum(tokens).cast("double") / cnt).alias("avg_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "text_tokens",
    oracle=r"""
    SELECT
      doc_id,
      CAST(len(string_split_regex(text, '\s+')) AS INTEGER) AS n_ws_tokens,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
           AS INTEGER) AS n_bpe_ish_tokens
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split + a BPE-ish regex tokenizer
    (letter runs / digit runs / single punctuation)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).cast("int").alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
        .cast("int")
        .alias("n_bpe_ish_tokens"),
    )


@register(
    "text_quality",
    oracle=r"""
    SELECT
      doc_id,
      n_chars,
      CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        / n_chars AS punct_ratio,
      CAST(len(regexp_extract_all(lower(text), '\b(the|and|is|of|to|in|that|for)\b'))
           AS DOUBLE)
        / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) AS stopword_ratio,
      CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / n_chars AS digit_ratio,
      CAST(n_chars AS DOUBLE)
        / CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) AS chars_per_token
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter signals: punctuation / stopword / digit ratios
    and mean token length — the standard cheap pre-filters before
    expensive model-based scoring."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), r"\s+")).cast("double")
    rc = lambda c, pat: F.regexp_count(c, F.lit(pat)).cast("double")
    return d.select(
        "doc_id",
        "n_chars",
        (rc(F.col("text"), r"[.,!?;:]") / F.col("n_chars")).alias("punct_ratio"),
        (rc(F.lower(F.col("text")), LANG_MARKERS["en"]) / n_tokens).alias(
            "stopword_ratio"
        ),
        (rc(F.col("text"), r"[0-9]") / F.col("n_chars")).alias("digit_ratio"),
        (F.col("n_chars").cast("double") / n_tokens).alias("chars_per_token"),
    )


def _langid_oracle() -> str:
    score = {
        lang: f"len(regexp_extract_all(lower(text), '{pat}'))"
        for lang, pat in LANG_MARKERS.items()
    }
    # deterministic argmax: sort (score desc, neg desc) and take the
    # head — same struct-field comparison in both engines.
    struct_list = (
        "["
        + ", ".join(
            f"{{'score': CAST({expr} AS BIGINT), 'neg': -{i}, 'lang': '{lang}'}}"
            for i, (lang, expr) in enumerate(sorted(score.items()))
        )
        + "]"
    )
    return f"""
    SELECT doc_id, lang,
      list_sort({struct_list}, 'DESC')[1].lang AS pred_lang
    FROM documents
    """


@register("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive n-gram/stopword language ID: count per-language marker
    hits, argmax with deterministic tie-break (higher score first,
    then later-in-alphabet lang to match the struct sort order)."""
    d = table(spark, sf_dir, "documents")
    scored = F.array(
        *[
            F.struct(
                F.regexp_count(F.lower(F.col("text")), F.lit(pat))
                .cast("long")
                .alias("score"),
                F.lit(-i).alias("neg"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, pat) in enumerate(sorted(LANG_MARKERS.items()))
        ]
    )
    pred = F.sort_array(scored, asc=False).getItem(0).getField("lang")
    return d.select("doc_id", "lang", pred.alias("pred_lang"))


@register(
    "text_chunking",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    )
    SELECT doc_id,
           CAST(t.i - 1 AS INTEGER) AS chunk_no,
           array_to_string(w[(t.i - 1) * 24 + 1 : (t.i - 1) * 24 + 32], ' ')
             AS chunk_text,
           CAST(len(w[(t.i - 1) * 24 + 1 : (t.i - 1) * 24 + 32]) AS INTEGER)
             AS chunk_tokens
    FROM words,
         UNNEST(generate_series(1, greatest(CAST(ceil((len(w) - 8) / 24.0) AS BIGINT), 1)))
           AS t(i)
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: 32-token windows with 8-token
    overlap (stride 24) — the standard context-window packing step for
    training/RAG corpora. Pure array expressions: one scan, 1→N rows,
    no UDF. At 100 TB the output is written partitioned by a hash of
    doc_id so downstream shuffles are balanced."""
    from kawa_spark.functions.hof import bind

    d = table(spark, sf_dir, "documents")

    # let-bind the word array: an unbound split() reference inside the
    # per-chunk lambda re-splits the document at every chunk position
    # (functions/hof.py)
    def chunks_of(ws: F.Column) -> F.Column:
        n_chunks = F.greatest(
            F.ceil((F.size(ws) - F.lit(8)) / F.lit(24.0)).cast("long"),
            F.lit(1),
        )
        return F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda i: F.struct(
                (i - 1).cast("int").alias("chunk_no"),
                F.concat_ws(" ", F.slice(ws, (i - 1) * 24 + 1, 32)).alias(
                    "chunk_text"
                ),
                F.least(
                    F.size(ws) - ((i - 1) * 24), F.lit(32)
                ).cast("int").alias("chunk_tokens"),
            ),
        )

    chunks = bind(F.split(F.col("text"), " "), chunks_of)
    return (
        d.select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_no", "c.chunk_text", "c.chunk_tokens")
    )


@register(
    "text_redact_pii",
    oracle=r"""
    SELECT
      doc_id,
      regexp_replace(
        regexp_replace(
          regexp_replace(text || ' contact: user' || doc_id ||
                         '@example.com +1-555-0' || lpad(CAST(doc_id AS VARCHAR), 3, '0') || '-1234',
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g'),
        '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS redacted,
      CAST(len(regexp_extract_all(text || ' contact: user' || doc_id ||
               '@example.com +1-555-0' || lpad(CAST(doc_id AS VARCHAR), 3, '0') || '-1234',
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
        AS n_emails
    FROM documents
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails → <EMAIL>, phones → <PHONE>, SSN-shaped →
    <SSN>) — the redaction pass before corpus release. The corpus has
    no PII, so a synthetic contact line (derived from doc_id, fully
    deterministic) is appended before redaction to prove the rules
    fire; production drops that concat."""
    d = table(spark, sf_dir, "documents")
    with_pii = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com +1-555-0"),
        F.lpad(F.col("doc_id").cast("string"), 3, "0"),
        F.lit("-1234"),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
    ssn_re = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(with_pii, email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ),
        ssn_re,
        "<SSN>",
    )
    return d.select(
        "doc_id",
        redacted.alias("redacted"),
        F.regexp_count(with_pii, F.lit(email_re)).cast("int").alias("n_emails"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT
      doc_id,
      md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS norm_fingerprint,
      CASE WHEN len(string_split(text, ' ')) >= 5 THEN
        list_min(list_transform(
          generate_series(1, len(string_split(text, ' ')) - 4),
          i -> md5(array_to_string(string_split(text, ' ')[i:i+4], ' '))))
      ELSE md5(text) END AS shingle_min_hash
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: (a) md5 of whitespace-normalized text;
    (b) min-hash over 5-word shingles (the rolling-hash fingerprint
    used as a near-dup prefilter). Arrays + HOFs only, no UDF."""
    from kawa_spark.functions.hof import bind

    d = spread(table(spark, sf_dir, "documents"), "doc_id")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))

    # let-bind the word array (functions/hof.py): an unbound split()
    # inside the per-position lambda re-splits the doc per shingle
    def min_shingle(ws: F.Column) -> F.Column:
        n = F.size(ws)
        return F.when(
            n >= 5,
            F.array_min(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(n - 4, F.lit(1))),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(ws, i, 5))),
                )
            ),
        ).otherwise(F.md5(F.col("text")))

    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_fingerprint"),
        bind(F.split(F.col("text"), " "), min_shingle).alias(
            "shingle_min_hash"
        ),
    )
