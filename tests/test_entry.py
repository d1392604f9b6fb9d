"""Smoke tests for the driver contract (__spark_entry__)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "Variable" in df.columns and "pvalue" in df.columns


def test_queries_and_oracles_aligned():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle without query: {unknown}"
    # every non-SQL-expressible query is deliberate (documented rows-only)
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {
        "association_study_covariates",
        "association_study_weighted_orders",
        "glm_logistic_orders",
        "interaction_study_lineitem",
        "minhash_dedup_documents",
        "minhash_dedup_transitive_documents",
        "simhash_documents",
        "similarity_lsh_embeddings",
        "similarity_ivf_probe_embeddings",
        "embedding_neardup_lsh_embeddings",
        "multimodal_features_documents",
    }


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "exact_dedup_documents",
        "windowed_events",
        "ngram_jaccard_documents",
        "embedding_neardup_embeddings",
        "embedding_neardup_lsh_embeddings",
        "colfilter_min_n_events",
        "get_significant_documents",
    ],
)
def test_sample_queries_run_on_smallest_sf(spark, name):
    df = entry_mod.queries()[name](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
