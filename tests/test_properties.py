"""Property-based checks (hypothesis) for driver-side statistical
invariants that golden/oracle tests only probe pointwise.

Spark jobs are expensive per example, so max_examples is kept small —
these are invariant checks, not fuzzing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from clarite_python_spark.operators import analyze, dedup


def _bh_reference(pvals: np.ndarray) -> np.ndarray:
    """Independent statsmodels-style BH implementation (sort desc,
    running min of p*m/rank, clip at 1)."""
    m = len(pvals)
    order = np.argsort(pvals)[::-1]  # descending
    ranked = pvals[order] * m / np.arange(m, 0, -1)
    out = np.minimum.accumulate(np.minimum(ranked, 1.0))
    unsorted = np.empty(m)
    unsorted[order] = out
    return unsorted


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=40,
    )
)
@example(pvals=[0.5, 0.5])  # regression: BH ties must share the cummin frame
@example(pvals=[0.2, 0.2, 0.2, 0.9])
def test_corrected_pvalues_match_reference_impl(spark, pvals):
    pdf = pd.DataFrame(
        {"Variable": [f"v{i}" for i in range(len(pvals))], "pvalue": pvals}
    )
    out = (
        analyze.add_corrected_pvalues(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("Variable")
    )
    arr = np.asarray(pvals)
    bonf = np.minimum(arr * len(arr), 1.0)
    bh = _bh_reference(arr)
    for i in range(len(arr)):
        assert out.loc[f"v{i}", "pvalue_bonferroni"] == pytest.approx(
            bonf[i], rel=1e-12, abs=1e-15
        )
        assert out.loc[f"v{i}", "pvalue_fdr"] == pytest.approx(
            bh[i], rel=1e-12, abs=1e-15
        )


def test_exact_dedup_whitespace_case_invariance(spark):
    """The dedup fingerprint normalizes case and whitespace runs: texts
    differing only there must collapse to one representative (min id)."""
    rows = [
        (1, "The quick   brown\tfox"),
        (2, "the quick brown fox"),
        (3, "  THE QUICK BROWN FOX  "),
        (4, "a different document"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    kept = {r["doc_id"] for r in dedup.exact_dedup(docs).collect()}
    assert kept == {1, 4}


def test_minhash_identical_texts_identical_signatures(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon")],
        "doc_id: long, text: string",
    )
    sigs = [
        r["sig"]
        for r in docs.select(
            dedup.minhash_signature(dedup.shingles("text", 3)).alias("sig")
        ).collect()
    ]
    assert sigs[0] == sigs[1]
    assert len(sigs[0]) == 32


def _paragraph_dedup_reference(docs: list[tuple[int, str]], sep: str = "\n"):
    """Pure-python reference: global first-occurrence-wins by
    (doc_id, position) over trimmed, case-folded paragraphs."""
    seen: set[str] = set()
    out = {}
    totals = {}
    for doc_id, txt in sorted(docs):
        paras = [p.strip() for p in txt.split(sep)]
        paras = [p for p in paras if p]
        totals[doc_id] = len(paras)
        kept = []
        for p in paras:
            key = p.lower()
            if key not in seen:
                seen.add(key)
                kept.append(p)
        if kept:
            out[doc_id] = ("\n".join(kept), len(kept), totals[doc_id])
    return out


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    st.lists(
        st.lists(
            # small alphabet + short paragraphs => real collisions
            st.text(alphabet="ab ", min_size=0, max_size=6),
            min_size=0,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    )
)
@example(docs_paras=[["a"], ["a"], ["A "]])           # all-dup docs drop
@example(docs_paras=[["a", "a", "b"], ["b", "c"]])    # intra+inter dup
def test_paragraph_dedup_matches_reference(spark, docs_paras):
    docs = [(i, "\n".join(paras)) for i, paras in enumerate(docs_paras)]
    want = _paragraph_dedup_reference(docs)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_paras_kept"], r["n_paras_total"])
        for r in dedup.paragraph_dedup(df).collect()
    }
    assert got == want


def _duplicate_spans_reference(docs: list[tuple[int, str]], n: int, min_count: int = 2):
    """Pure-python reference for duplicate_spans: count every n-token
    window (case-folded), mark windows with count >= min_count, merge
    overlapping marked windows per doc into covered-token totals."""
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in docs}
    counts: dict[tuple, int] = {}
    for tk in toks.values():
        for i in range(len(tk) - n + 1):
            g = tuple(tk[i : i + n])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for d, tk in toks.items():
        wins = [i for i in range(len(tk) - n + 1) if counts[tuple(tk[i : i + n])] >= min_count]
        covered = 0
        prev = None
        for i in wins:
            covered += n if prev is None else min(n, i - prev)
            prev = i
        ntok = len(tk)
        out[d] = (
            ntok,
            max(ntok - n + 1, 0),
            len(wins),
            covered,
            round(covered / ntok, 6) if ntok else 0.0,
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    st.lists(
        # 2-letter alphabet + spaces => frequent window collisions
        st.text(alphabet="xy ", min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    )
)
@example(texts=["x y x y x y", "x y x y"])        # overlap runs
@example(texts=["x x x x x x", "y"])              # within-doc repetition
@example(texts=["x", ""])                         # shorter than n
def test_duplicate_spans_matches_reference(spark, texts):
    from clarite_python_spark.operators.dedup import duplicate_spans

    docs = list(enumerate(texts))
    want = _duplicate_spans_reference(docs, n=3)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_windows"], r["dup_windows"], r["dup_tokens"], r["dup_fraction"],
        )
        for r in duplicate_spans(df, n=3).collect()
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    run=st.lists(st.sampled_from("pqrs"), min_size=6, max_size=10),
    pre_a=st.lists(st.sampled_from("abc"), min_size=0, max_size=6),
    pre_b=st.lists(st.sampled_from("xyz"), min_size=0, max_size=6),
)
def test_winnowing_guarantee_shared_run_shares_fingerprint(spark, run, pre_a, pre_b):
    """The SIGMOD'03 winnowing guarantee: any shared token run of length
    >= window + k - 1 between two documents yields at least one shared
    fingerprint. Two docs share a planted run (length >= 6 = 4 + 3 - 1)
    embedded after unrelated prefixes from disjoint alphabets."""
    from clarite_python_spark.operators.text import winnow_fingerprints

    doc_a = " ".join(pre_a + run)
    doc_b = " ".join(pre_b + run)
    df = spark.createDataFrame([(1, doc_a), (2, doc_b)], "doc_id long, text string")
    fp = winnow_fingerprints(df, k=3, window=4)
    rows = fp.collect()
    a = {r["fingerprint"] for r in rows if r["doc_id"] == 1}
    b = {r["fingerprint"] for r in rows if r["doc_id"] == 2}
    assert a & b, (doc_a, doc_b)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    st.lists(st.text(alphabet="ab \n", min_size=0, max_size=12), min_size=1, max_size=6)
)
def test_dedup_operators_are_idempotent(spark, texts):
    """exact_dedup and paragraph_dedup are fixpoints: applying them to
    their own output changes nothing."""
    from clarite_python_spark.operators.dedup import exact_dedup, paragraph_dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    once = exact_dedup(df)
    assert sorted(r["doc_id"] for r in exact_dedup(once).collect()) == sorted(
        r["doc_id"] for r in once.collect()
    )
    p_once = paragraph_dedup(df)
    p_twice = paragraph_dedup(p_once)
    a = {(r["doc_id"], r["text"]) for r in p_once.collect()}
    b = {(r["doc_id"], r["text"]) for r in p_twice.collect()}
    assert a == b


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    e1=st.floats(min_value=0.1, max_value=4.0, allow_nan=False),
    e2=st.floats(min_value=0.1, max_value=4.0, allow_nan=False),
)
def test_epoch_repeat_nesting_and_expectation(spark, e1, e2):
    """For ANY pair of epoch counts, the smaller count's (id, epoch)
    multiset is a subset of the larger's, and the realized copy count of
    every doc is floor(e) or ceil(e) — the fractional-coin contract."""
    import math

    from clarite_python_spark.operators.pipeline import epoch_repeat

    df = spark.range(60).selectExpr("id AS doc_id")
    lo, hi = sorted([e1, e2])
    a = {(r["doc_id"], r["epoch"]) for r in epoch_repeat(df, lo, salt="p").collect()}
    b = {(r["doc_id"], r["epoch"]) for r in epoch_repeat(df, hi, salt="p").collect()}
    assert a <= b
    from collections import Counter

    per_doc = Counter(d for d, _ in b)
    for d in range(60):
        assert per_doc.get(d, 0) in (math.floor(hi), math.ceil(hi))


def test_dsir_weight_shift_monotonicity(spark):
    """Adding more target mass on a token's bucket must not DECREASE the
    weight of documents made of that token (ratio numerator grows)."""
    from clarite_python_spark.operators.pipeline import dsir_logweights

    raw = spark.createDataFrame(
        [(1, "zebra zebra zebra"), (2, "other words here")], ["doc_id", "text"]
    )
    t_small = spark.createDataFrame([(10, "zebra")], ["doc_id", "text"])
    t_big = spark.createDataFrame(
        [(10, "zebra"), (11, "zebra zebra zebra zebra")], ["doc_id", "text"]
    )
    w_small = {r["doc_id"]: r["log_weight"] for r in dsir_logweights(raw, t_small).collect()}
    w_big = {r["doc_id"]: r["log_weight"] for r in dsir_logweights(raw, t_big).collect()}
    assert w_big[1] >= w_small[1]


# ------------------------------------------------------- round-10 ops --


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),      # key
            st.integers(min_value=-3, max_value=3),      # value
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=-3, max_value=3),
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
)
def test_table_diff_patch_reconstructs_new(spark, old_rows, new_rows):
    """Applying the diff to `old` must reconstruct `new` exactly:
    drop removed keys, add added keys, overwrite changed keys."""
    from clarite_python_spark.operators import evaluation

    old = spark.createDataFrame(
        pd.DataFrame(old_rows or [(99, 0)], columns=["k", "v"]).astype("int64")
    )
    new = spark.createDataFrame(
        pd.DataFrame(new_rows or [(98, 0)], columns=["k", "v"]).astype("int64")
    )
    diff = {
        r["k"]: r["status"]
        for r in evaluation.table_diff(old, new, keys=["k"]).collect()
    }
    old_d = dict(old_rows or [(99, 0)])
    new_d = dict(new_rows or [(98, 0)])
    patched = {
        k: v
        for k, v in old_d.items()
        if diff.get(k) != "removed"
    }
    for k, status in diff.items():
        if status in ("added", "changed"):
            patched[k] = new_d[k]
    assert patched == new_d
    # status partition is exact
    for k, status in diff.items():
        if status == "added":
            assert k in new_d and k not in old_d
        elif status == "removed":
            assert k in old_d and k not in new_d
        else:
            assert old_d[k] != new_d[k]


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_connected_components_matches_union_find(spark, edge_list):
    """Both kernel arms (plain and pointer-jumped) must equal a plain
    python union-find on arbitrary random graphs (self-loops included)."""
    from clarite_python_spark.operators import graph

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for node in parent:
        want[node] = find(node)

    edges = spark.createDataFrame(
        pd.DataFrame(edge_list, columns=["src", "dst"]).astype("int64")
    )
    for shortcut in (False, True):
        got = {
            r["node"]: r["component"]
            for r in graph.connected_components(
                edges, shortcut=shortcut
            ).collect()
        }
        assert got == want, f"shortcut={shortcut}"


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # query
            st.integers(min_value=0, max_value=15),  # doc
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_rank_eval_metrics_bounded_and_perfect_on_ideal(spark, rel_pairs):
    """All metrics live in [0,1]; scoring the IDEAL ranking of the qrels
    themselves gives ndcg == recall == mrr == 1 (binary rels, k >= n)."""
    from clarite_python_spark.operators import evaluation

    qrels = spark.createDataFrame(
        pd.DataFrame(rel_pairs, columns=["query_id", "doc_id"])
        .astype("int64")
        .assign(rel=1.0)
    )
    # ideal results: every query's relevant docs ranked 1..n by doc id
    pdf = pd.DataFrame(rel_pairs, columns=["query_id", "doc_id"]).astype("int64")
    pdf = pdf.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    results = spark.createDataFrame(pdf)
    out = evaluation.rank_eval(results, qrels, k=20).collect()
    for r in out:
        for m in ("precision", "recall", "mrr", "ndcg"):
            assert 0.0 <= r[m] <= 1.0
        assert r["recall"] == pytest.approx(1.0)
        assert r["mrr"] == pytest.approx(1.0)
        assert r["ndcg"] == pytest.approx(1.0)
