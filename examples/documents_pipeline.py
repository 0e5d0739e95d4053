"""LLM training-data curation pipeline on the engine's own framework.

The §2C operators composed the way a data-curation team would deploy
them: bronze ingest of the raw document dump → silver curation (exact
dedup, quality gate, token budgeting via the whitespace and BPE-style
tokenizers) → gold per-language corpus statistics. Every hop is an
``@etl`` pipeline with declared, verified schemas — the reference's
framework (etl.py:145-217) carrying the engine's LLM operators.

All transforms are built-in expressions (no UDFs): dedup is one shuffle
on md5(text), quality and token stats are narrow projections, the gold
rollup is a single hash agg — the pipeline streams at scan speed over a
100 TB dump.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from jorvik_spark.pipelines import ETL, FileInput, FileOutput, etl
from jorvik_spark.queries.text_analysis import (
    _BPE_PAT,
    _PII_EMAIL,
    _PII_URL,
    _STOPWORDS,
    _TOKENS,
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

CURATED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
        StructField("n_tokens", LongType()),
        StructField("n_bpe_tokens", LongType()),
        StructField("stopword_ratio", DoubleType()),
    ]
)

CORPUS_STATS_SCHEMA = StructType(
    [
        StructField("lang", StringType()),
        StructField("n_docs", LongType()),
        StructField("total_tokens", LongType()),
        StructField("total_bpe_tokens", LongType()),
        StructField("avg_doc_tokens", DoubleType()),
    ]
)

# Quality gate: drop docs that are too short to train on, that look like
# boilerplate (almost no stopwords => listings/code/noise), or that are
# dominated by repeated bigrams (looping templates — Gopher-style gate).
MIN_TOKENS = 5
MIN_STOPWORD_RATIO = 0.01
MAX_DUP_BIGRAM_RATIO = 0.5

# The engine's English stopword list (text_analysis._STOPWORDS) — imported
# so the example's quality gate and text_quality_score/text_language_id
# cannot silently disagree on what counts as a stopword.
_STOP_EN = _STOPWORDS["en"]


def make_bronze_documents(sf_dir: str, lake: str) -> ETL:
    """Bronze: schema-verified ingest of the raw document dump."""
    raw = FileInput(path=f"{sf_dir}/documents.parquet", schema=DOCUMENTS_SCHEMA)
    bronze = FileOutput(
        path=f"{lake}/bronze/documents", mode="overwrite", schema=DOCUMENTS_SCHEMA
    )

    @etl(raw, bronze)
    def ingest_documents(docs: DataFrame) -> DataFrame:
        return docs

    return ingest_documents


def make_silver_curated(lake: str) -> ETL:
    """Silver: scrub-aware exact dedup (keep lowest doc_id per REDACTED
    content hash, so docs differing only in emails/URLs collapse),
    quality + repetition gates, and token budgets — partitioned by
    language for downstream per-language sampling."""
    bronze = FileInput(path=f"{lake}/bronze/documents", schema=DOCUMENTS_SCHEMA)
    silver = FileOutput(
        path=f"{lake}/silver/curated",
        mode="overwrite",
        partition_fields="lang",
        schema=CURATED_SCHEMA,
    )

    @etl(bronze, silver)
    def curate_documents(docs: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        # Dedup on the scrubbed fingerprint (text_scrub_pii semantics):
        # contact details and tracking links differ between otherwise
        # identical mirror copies and must not defeat exact dedup.
        scrubbed_key = F.md5(
            F.expr(
                f"regexp_replace(regexp_replace(text, '{_PII_EMAIL}', "
                f"'<EMAIL>'), '{_PII_URL}', '<URL>')"
            )
        )
        keep_first = Window.partitionBy(scrubbed_key).orderBy("doc_id")
        toks = F.expr(_TOKENS)
        bigrams = F.expr(
            "if(size(t) >= 2, transform(sequence(1, size(t) - 1), "
            "i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1))), "
            "array())"
        )
        dup_bigram_ratio = F.when(F.size("bg") == 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - F.size(F.array_distinct("bg")) * F.lit(1.0) / F.size("bg")
        )
        stop_hits = F.size(
            F.expr(
                "filter(t, x -> x IN ({}))".format(
                    ", ".join(f"'{w}'" for w in _STOP_EN)
                )
            )
        )
        return (
            docs.withColumn("rn", F.row_number().over(keep_first))
            .filter(F.col("rn") == 1)
            .withColumn("t", toks)
            .withColumn("n_tokens", F.size("t").cast("long"))
            .withColumn(
                "n_bpe_tokens",
                F.size(
                    F.regexp_extract_all(F.lower("text"), F.lit(_BPE_PAT), 0)
                ).cast("long"),
            )
            .withColumn(
                "stopword_ratio",
                stop_hits / F.greatest(F.col("n_tokens"), F.lit(1)),
            )
            .withColumn("bg", bigrams)
            .filter(
                (F.col("n_tokens") >= MIN_TOKENS)
                & (
                    (F.col("lang") != "en")
                    | (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
                )
                & (dup_bigram_ratio <= MAX_DUP_BIGRAM_RATIO)
            )
            .select(
                "doc_id", "text", "lang", "source", "n_chars",
                "n_tokens", "n_bpe_tokens", "stopword_ratio",
            )
        )

    return curate_documents


def make_gold_corpus_stats(lake: str) -> ETL:
    """Gold: per-language token budget — what a pretraining data mixer
    reads to weight corpus sampling."""
    silver = FileInput(path=f"{lake}/silver/curated", schema=CURATED_SCHEMA)
    gold = FileOutput(
        path=f"{lake}/gold/corpus_stats",
        mode="overwrite",
        schema=CORPUS_STATS_SCHEMA,
    )

    @etl(silver, gold)
    def corpus_stats(curated: DataFrame) -> DataFrame:
        return curated.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
            F.avg("n_tokens").alias("avg_doc_tokens"),
        )

    return corpus_stats


def run_pipeline(sf_dir: str, lake: str) -> None:
    """bronze → silver → gold, in dependency order."""
    make_bronze_documents(sf_dir, lake).run()
    make_silver_curated(lake).run()
    make_gold_corpus_stats(lake).run()
