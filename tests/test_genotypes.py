"""Genotype-encoding tests (reference encodes via pandas-genomics before
regression, glm_regression.py:364-384; GWAS simulation strategy mirrors
tests/analyze/test_gwas.py: signal SNPs must hit small pvalues, null SNPs
must not)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from clarite_python_spark.catalog import CATEGORICAL, CONTINUOUS, ClariteFrame
from clarite_python_spark.operators import analyze, modify


def _gt(rng, n, maf):
    """n genotype strings 'a/b' for a biallelic variant with alt freq maf."""
    alt_counts = rng.binomial(2, maf, n)
    return (
        np.where(alt_counts == 0, "A/A", np.where(alt_counts == 1, "A/T", "T/T")),
        alt_counts.astype(float),
    )


@pytest.fixture(scope="module")
def gwas_cf(spark):
    rng = np.random.RandomState(1855)
    n = 1200
    g_signal, add_signal = _gt(rng, n, 0.3)
    g_null, _ = _gt(rng, n, 0.3)
    y = 2.0 + 1.5 * add_signal + rng.randn(n)
    pdf = pd.DataFrame(
        {
            "ID": np.arange(n),
            "outcome": y,
            "snp_signal": g_signal,
            "snp_null": g_null,
        }
    )
    cf = ClariteFrame(spark.createDataFrame(pdf))
    cf = modify.make_continuous(cf, only=["outcome"])
    cf = modify.make_genotypes(
        cf, {"snp_signal": ("A", "T"), "snp_null": ("A", "T")}
    )
    return cf


def run(cf, **kw):
    res = analyze.association_study(
        cf, outcomes="outcome", min_n=50, **kw
    ).toPandas()
    return res.set_index("Variable")


def test_additive_signal_vs_null(gwas_cf):
    res = run(gwas_cf, encoding="additive")
    assert res.loc["snp_signal", "Variable_type"] == CONTINUOUS
    assert res.loc["snp_signal", "pvalue"] < 1e-10
    assert res.loc["snp_null", "pvalue"] > 1e-5
    # additive beta recovers the simulated effect
    assert abs(res.loc["snp_signal", "Beta"] - 1.5) < 0.2


def test_dominant_recessive(gwas_cf):
    dom = run(gwas_cf, encoding="dominant")
    rec = run(gwas_cf, encoding="recessive")
    assert dom.loc["snp_signal", "pvalue"] < 1e-6
    assert rec.loc["snp_signal", "pvalue"] < 1e-6
    # dominant beta > recessive-coded data beta differences exist; betas differ
    assert dom.loc["snp_signal", "Beta"] != rec.loc["snp_signal", "Beta"]


def test_codominant_lrt(gwas_cf):
    res = run(gwas_cf, encoding="codominant")
    assert res.loc["snp_signal", "Variable_type"] == CATEGORICAL
    assert np.isnan(res.loc["snp_signal", "Beta"])
    assert res.loc["snp_signal", "LRT_pvalue"] < 1e-10


def test_edge_encoding(gwas_cf):
    info = pd.DataFrame(
        {
            "Variant ID": ["snp_signal", "snp_null"],
            "Alpha Value": [0.5, 0.5],
        }
    )
    res = run(gwas_cf, encoding="edge", edge_encoding_info=info)
    assert res.loc["snp_signal", "pvalue"] < 1e-10
    # edge with alpha=0.5 on an additive signal ~ additive beta * 2
    assert abs(res.loc["snp_signal", "Beta"] - 3.0) < 0.5


def test_edge_requires_info(gwas_cf):
    with pytest.raises(ValueError, match="edge_encoding_info"):
        run(gwas_cf, encoding="edge")


def test_unknown_encoding(gwas_cf):
    with pytest.raises(ValueError, match="unknown 'encoding'"):
        run(gwas_cf, encoding="bogus")


def test_gwas_scale_case_control(spark):
    """GWAS-shaped statistical + fan-out canary (mirrors the reference's
    simulated case/control GWAS, tests/analyze/test_gwas.py:10-31 and the
    10k x 1k 'largeish' sim at :34-57, without pandas-genomics): signal
    SNPs must reach p<=1e-5 through the binomial fan-out, null SNPs must
    not pile up below it. Also exercises the wide-Expand path at 1,000
    variables x 10k rows."""
    rng = np.random.RandomState(42)
    n, p = 10_000, 1_000
    signal = {"SNP1": 0.8, "SNP2": 0.6}
    maf = rng.uniform(0.1, 0.4, p)
    counts = rng.binomial(2, maf, size=(n, p))
    eta = -0.5 + counts[:, 0] * signal["SNP1"] + counts[:, 1] * signal["SNP2"]
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-eta))).astype(int)
    gt = np.where(counts == 0, "A/A", np.where(counts == 1, "A/T", "T/T"))
    cols = {"ID": np.arange(n), "Outcome": np.where(y == 1, "Case", "Control")}
    names = [f"SNP{i + 1}" for i in range(p)]
    for i, nm in enumerate(names):
        cols[nm] = gt[:, i]
    cf = ClariteFrame(spark.createDataFrame(pd.DataFrame(cols)))
    cf = modify.make_binary(cf, only=["Outcome"])
    cf = modify.make_genotypes(cf, {nm: ("A", "T") for nm in names})
    res = (
        analyze.association_study(cf, outcomes="Outcome", min_n=50, encoding="additive")
        .toPandas()
        .set_index("Variable")
    )
    assert len(res) == p
    assert res["Converged"].all()
    for nm in signal:
        assert res.loc[nm, "pvalue"] <= 1e-5, nm
    nulls = res.drop(index=list(signal))
    # 998 null SNPs: none should look genome-wide significant, and only
    # chance-level counts may dip below 1e-2
    assert (nulls["pvalue"] > 1e-5).all()
    assert (nulls["pvalue"] < 1e-2).sum() <= 30
