"""Cross-engine parity on a DIRTY corpus.

The driver testdata is clean; a real 100 TB crawl is not. These tests pin
the null-text contract (null document == empty document — tokenizers
normalize NULL to an empty array on BOTH engines) plus empty, whitespace-
only, unicode, single-token, and exact-duplicate rows, for every
documents-table operator with an oracle.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from jorvik_spark.queries import ORACLES, QUERIES
from tests.oracle_utils import compare

ROWS = [
    (0, None, "en", "src0", 0),
    (1, "", "en", "src0", 0),
    (2, "   \t  \n ", "de", "src1", 8),
    (3, "héllo wörld céçi ünïcode tøkens", "fr", "src1", 31),
    (4, "one", "en", "src2", 3),
    (5, "dup dup dup dup dup", "en", "src2", 19),
    (6, "dup dup dup dup dup", "zh", "src0", 19),
    (7, "mail me a@b.co or see https://x.io/y now", "en", "src1", 40),
]

DOC_QUERIES = [
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_fingerprint",
    "text_scrub_pii",
    "text_repetition_ratio",
    "text_length_histogram",
    "text_token_bpe",
    "text_ngram_counts",
    "text_explode_positional",
    "text_rare_token_ratio",
    "dedup_exact",
    "dedup_cross_source",
    "dedup_ngram_jaccard",
    "dedup_minhash_banded",
    "dedup_minhash_components",
    "dedup_simhash",
    "decontaminate_overlap",
    "pack_sequences",
    "sample_stratified_split",
    "sample_domain_reweight",
    "export_shard_assign",
    "corpus_domain_mix",
]


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty")
    pd.DataFrame(
        ROWS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def dirty_con(dirty_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dirty_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_dirty_corpus_parity(spark, dirty_dir, dirty_con, name):
    compare(QUERIES[name](spark, dirty_dir), dirty_con, ORACLES[name], name)


def test_null_text_tokenizes_to_empty(spark, dirty_dir):
    """The contract itself: null and empty text produce zero tokens, not
    null stats."""
    stats = {
        r["doc_id"]: r
        for r in QUERIES["text_token_stats"](spark, dirty_dir).collect()
    }
    for doc_id in (0, 1, 2):  # null, empty, whitespace-only
        assert stats[doc_id]["n_tokens"] == 0
        assert stats[doc_id]["n_token_chars"] == 0


EMB_QUERIES = [
    "simsearch_topk",
    "simsearch_ivf",
    "simsearch_lsh_det",
    "dedup_embedding_cosine",
    "embed_centroids",
    "embed_quantize_int8",
]


@pytest.fixture(scope="module")
def dirty_emb_dir(tmp_path_factory):
    import numpy as np

    d = tmp_path_factory.mktemp("dirty_emb")
    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(64).astype("float32"), f"lab{i % 3}") for i in range(12)]
    rows.append((12, np.zeros(64, dtype="float32"), "lab0"))  # zero vector
    rows.append((13, rows[5][1].copy(), "lab1"))  # exact duplicate vector
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def dirty_emb_con(dirty_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{dirty_emb_dir}/embeddings.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_dirty_embeddings_parity(spark, dirty_emb_dir, dirty_emb_con, name):
    """A zero-norm embedding must not crash (ANSI DIVIDE_BY_ZERO) or
    diverge: cosine-based ops exclude degenerate vectors on both engines;
    quantization/centroids keep them."""
    compare(QUERIES[name](spark, dirty_emb_dir), dirty_emb_con, ORACLES[name], name)
