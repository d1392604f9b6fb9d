"""CLI tests: the reference's file-based pipeline flow (load -> modify ->
describe -> analyze) driven through cli.main with parquet + .dtypes
sidecar datasets (reference clarite/cli/)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from clarite_python_spark import cli
from clarite_python_spark.sources.io import from_parquet


@pytest.fixture()
def tsv_file(tmp_path, ewas_pdf):
    p = tmp_path / "data.tsv"
    ewas_pdf.to_csv(p, sep="\t", index=False)
    return str(p)


def test_cli_pipeline(spark, tmp_path, tsv_file):
    d = str(tmp_path)
    assert cli.main(["load", "from-tsv", tsv_file, f"{d}/ds1", "--index-col", "ID"]) == 0
    assert os.path.exists(f"{d}/ds1.dtypes")

    assert cli.main(["modify", "categorize", f"{d}/ds1", f"{d}/ds2"]) == 0
    cf = from_parquet(spark, f"{d}/ds2")
    assert cf.catalog.get("outcome") == "continuous"
    assert cf.catalog.get("sex") == "binary"
    assert cf.catalog.get("cat_var") == "categorical"

    assert cli.main(["modify", "colfilter", f"{d}/ds2", f"{d}/ds3", "--skip", "noise2"]) == 0
    cf3 = from_parquet(spark, f"{d}/ds3")
    assert "noise2" not in cf3.variables

    assert cli.main(["describe", "percent-na", f"{d}/ds3", f"{d}/pna"]) == 0
    pna = spark.read.parquet(f"{d}/pna").toPandas()
    assert set(pna.columns) == {"variable", "percent_na"}

    assert (
        cli.main(
            [
                "analyze",
                "association-study",
                f"{d}/ds3",
                f"{d}/res",
                "--outcomes",
                "outcome",
                "--covariates",
                "age",
                "sex",
                "--min-n",
                "50",
            ]
        )
        == 0
    )
    res = spark.read.parquet(f"{d}/res").toPandas()
    assert "signal" in set(res.Variable)
    assert res.set_index("Variable").loc["signal", "pvalue"] < 1e-10

    assert cli.main(["analyze", "add-corrected-pvalues", f"{d}/res", f"{d}/resc"]) == 0
    resc = spark.read.parquet(f"{d}/resc").toPandas()
    assert {"pvalue_bonferroni", "pvalue_fdr"} <= set(resc.columns)

    assert (
        cli.main(
            ["analyze", "get-significant", f"{d}/resc", f"{d}/sig", "--pvalue", "0.05"]
        )
        == 0
    )
    sig = spark.read.parquet(f"{d}/sig").toPandas()
    assert (sig.pvalue_fdr <= 0.05).all()
    assert "signal" in set(sig.Variable)


def test_cli_rowfilter_and_outliers(spark, tmp_path, tsv_file):
    d = str(tmp_path)
    cli.main(["load", "from-tsv", tsv_file, f"{d}/a", "--index-col", "ID"])
    cli.main(["modify", "categorize", f"{d}/a", f"{d}/b"])
    assert (
        cli.main(
            ["modify", "rowfilter", f"{d}/b", f"{d}/c", "--column", "age",
             "--comparison", "gte", "--value", "40"]
        )
        == 0
    )
    c = from_parquet(spark, f"{d}/c")
    ages = c.df.select("age").toPandas()["age"]
    assert (ages >= 40).all()
    assert (
        cli.main(
            ["modify", "remove-outliers", f"{d}/c", f"{d}/e", "--method", "iqr",
             "--cutoff", "1.5", "--only", "signal"]
        )
        == 0
    )


def test_cli_weights_file(spark, tmp_path, ewas_pdf):
    """--weights-file: per-variable weight mapping TSV."""
    d = str(tmp_path)
    rng_w = (ewas_pdf.ID % 7 + 1).astype(float)
    pdf = ewas_pdf.assign(w1=rng_w, w2=1.0)
    pdf.to_csv(f"{d}/data.tsv", sep="\t", index=False)
    with open(f"{d}/weights.tsv", "w") as fh:
        for v in ("signal", "noise1", "cat_var"):
            fh.write(f"{v}\tw1\n")
    cli.main(["load", "from-tsv", f"{d}/data.tsv", f"{d}/a", "--index-col", "ID"])
    cli.main(["modify", "categorize", f"{d}/a", f"{d}/b"])
    assert (
        cli.main(
            [
                "analyze", "association-study", f"{d}/b", f"{d}/res",
                "--outcomes", "outcome",
                "--covariates", "age", "sex",
                "--regression-variables", "signal", "noise1", "cat_var",
                "--weights-file", f"{d}/weights.tsv",
                "--min-n", "50",
            ]
        )
        == 0
    )
    res = spark.read.parquet(f"{d}/res").toPandas().set_index("Variable")
    assert res.loc["signal", "Weight"] == "w1"
    assert res.loc["signal", "pvalue"] < 1e-10


def test_cli_move_variables(spark, tmp_path, tsv_file):
    d = str(tmp_path)
    cli.main(["load", "from-tsv", tsv_file, f"{d}/a", "--index-col", "ID"])
    cli.main(["modify", "colfilter", f"{d}/a", f"{d}/other", "--only", "age", "sex"])
    assert (
        cli.main(
            ["modify", "move-variables", f"{d}/a", f"{d}/other", f"{d}/left",
             f"{d}/right", "--only", "noise2"]
        )
        == 0
    )
    left = from_parquet(spark, f"{d}/left")
    right = from_parquet(spark, f"{d}/right")
    assert "noise2" not in left.variables
    assert "noise2" in right.variables


def test_cli_plot_commands(spark, tmp_path, tsv_file):
    """distributions / manhattan-fdr / manhattan-bonferroni are wired:
    with matplotlib present they write files; without it (this
    container) the render gate must raise its clear ImportError AFTER
    the Spark-side prep ran — either way the CLI reaches the renderer."""
    from clarite_python_spark.plot import plots as plots_mod

    d = str(tmp_path)
    cli.main(["load", "from-tsv", tsv_file, f"{d}/a", "--index-col", "ID"])
    cli.main(["modify", "categorize", f"{d}/a", f"{d}/b"])
    cli.main(
        ["analyze", "association-study", f"{d}/b", f"{d}/res", "--outcomes",
         "outcome", "--covariates", "age", "sex", "--min-n", "50"]
    )
    cli.main(["analyze", "add-corrected-pvalues", f"{d}/res", f"{d}/resc"])

    cmds = [
        ["plot", "distributions", f"{d}/b", f"{d}/dist.pdf", "--nrows", "2", "--ncols", "2"],
        ["plot", "manhattan-fdr", f"{d}/resc", f"{d}/mf.png"],
        ["plot", "manhattan-bonferroni", f"{d}/resc", f"{d}/mb.png"],
    ]
    if plots_mod.HAS_MPL:
        for cmd in cmds:
            assert cli.main(cmd) == 0
            assert os.path.getsize(cmd[-1]) > 0
    else:
        for cmd in cmds:
            with pytest.raises(ImportError, match="matplotlib"):
                cli.main(cmd)


def test_cli_pipeline_group(spark, tmp_path):
    """Extension group: split/sample/pack/redact/dedup over plain parquet."""
    d = str(tmp_path)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = f"{d}/docs"
    docs.write.parquet(src)

    assert cli.main(["pipeline", "split", src, f"{d}/split",
                     "--fractions", "train=0.9", "test=0.1", "--salt", "s"]) == 0
    out = spark.read.parquet(f"{d}/split")
    assert set(r["split"] for r in out.select("split").distinct().collect()) == {"train", "test"}
    assert out.count() == docs.count()

    assert cli.main(["pipeline", "sample", src, f"{d}/samp", "--fraction", "0.3"]) == 0
    n = spark.read.parquet(f"{d}/samp").count()
    assert 0 < n < docs.count()

    assert cli.main(["pipeline", "pack", src, f"{d}/pack", "--max-tokens", "256"]) == 0
    packed = spark.read.parquet(f"{d}/pack")
    assert {"seq_id", "seq_offset", "n_tokens"} <= set(packed.columns)

    assert cli.main(["pipeline", "redact", src, f"{d}/red"]) == 0
    assert "text_redacted" in spark.read.parquet(f"{d}/red").columns

    assert cli.main(["pipeline", "dedup", src, f"{d}/dd"]) == 0
    assert 0 < spark.read.parquet(f"{d}/dd").count() <= docs.count()


def test_cli_pipeline_chunk(spark, tmp_path):
    d = str(tmp_path)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(f"{d}/docs")
    assert cli.main(["pipeline", "chunk", f"{d}/docs", f"{d}/chunks",
                     "--chunk-tokens", "64", "--overlap", "16"]) == 0
    out = spark.read.parquet(f"{d}/chunks")
    assert {"chunk_id", "chunk_text", "chunk_tokens_n"} <= set(out.columns)
    assert out.count() > 0


def test_cli_pipeline_quality_and_dedup_extensions(spark, tmp_path):
    d = str(tmp_path)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = f"{d}/docs"
    docs.write.parquet(src)

    assert cli.main(["pipeline", "quality", src, f"{d}/q"]) == 0
    out = spark.read.parquet(f"{d}/q")
    assert {"n_words", "gopher_pass", "pass_stopwords"} <= set(out.columns)

    assert cli.main(["pipeline", "repetition", src, f"{d}/rep"]) == 0
    assert {"dup_word_frac", "top2_char_frac"} <= set(
        spark.read.parquet(f"{d}/rep").columns
    )

    assert cli.main(["pipeline", "paragraph-dedup", src, f"{d}/pd", "--sep", "batch"]) == 0
    pd_out = spark.read.parquet(f"{d}/pd")
    assert {"n_paras_kept", "n_paras_total"} <= set(pd_out.columns)
    assert 0 < pd_out.count() <= docs.count()

    assert cli.main(["pipeline", "line-dedup", src, f"{d}/ld", "--sep", "batch",
                     "--scope-col", "source"]) == 0
    ld_out = spark.read.parquet(f"{d}/ld")
    assert {"n_lines_kept", "n_lines_total", "source"} <= set(ld_out.columns)
    assert 0 < ld_out.count() <= docs.count()

    assert cli.main(["pipeline", "jaccard-topk", src, f"{d}/jt", "--k", "3"]) == 0
    jt_out = spark.read.parquet(f"{d}/jt")
    assert {"neighbor_id", "jaccard", "rank"} <= set(jt_out.columns)

    assert cli.main(["pipeline", "hash-embed", src, f"{d}/he",
                     "--dim", "16"]) == 0
    he_out = spark.read.parquet(f"{d}/he")
    assert "embedding" in he_out.columns
    assert len(he_out.first()["embedding"]) == 16

    assert cli.main(["pipeline", "split-leakage", src, f"{d}/lk",
                     "--splits", '{"train": 0.8, "test": 0.2}']) == 0
    lk_out = spark.read.parquet(f"{d}/lk")
    assert {"split_a", "split_b", "n_shared"} <= set(lk_out.columns)

    assert cli.main(["pipeline", "token-budget", src, f"{d}/tb",
                     "--budget", "400", "--order-col", "n_chars"]) == 0
    tb_out = spark.read.parquet(f"{d}/tb")
    assert 0 < tb_out.count() < docs.count()

    assert cli.main(["pipeline", "shard-by-tokens", src, f"{d}/sh",
                     "--tokens-per-shard", "1500"]) == 0
    sh_out = spark.read.parquet(f"{d}/sh")
    assert {"shard", "cum_tokens"} <= set(sh_out.columns)
    assert sh_out.count() == docs.count()

    assert cli.main(["pipeline", "weighted-sample", src, f"{d}/ws",
                     "--n", "20", "--weight-col", "n_chars"]) == 0
    ws_out = spark.read.parquet(f"{d}/ws")
    assert ws_out.count() == 20 and "sample_score" in ws_out.columns

    assert cli.main(["pipeline", "perplexity-buckets", src, f"{d}/ppl",
                     "--approx"]) == 0
    ppl_out = spark.read.parquet(f"{d}/ppl")
    assert {"bits_per_token", "bucket", "bucket_label"} <= set(ppl_out.columns)

    docs.where("source = 'src0'").write.parquet(f"{d}/bench")
    assert cli.main(["pipeline", "contamination", src, f"{d}/bench", f"{d}/cont",
                     "--ngram", "5"]) == 0
    assert "contamination_frac" in spark.read.parquet(f"{d}/cont").columns

    assert cli.main(["pipeline", "decontaminate", src, f"{d}/bench", f"{d}/dec",
                     "--ngram", "5"]) == 0
    dec_out = spark.read.parquet(f"{d}/dec")
    assert {"removed_tokens", "text_cleaned"} <= set(dec_out.columns)

    assert cli.main(["pipeline", "contamination", src, f"{d}/bench", f"{d}/fuzzy",
                     "--fuzzy", "--threshold", "0.5"]) == 0
    assert {"bench_id", "jaccard"} <= set(spark.read.parquet(f"{d}/fuzzy").columns)


def test_cli_pipeline_clean(spark, tmp_path):
    d = str(tmp_path)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(f"{d}/docs")

    assert cli.main(["pipeline", "clean", f"{d}/docs", f"{d}/verdicts"]) == 0
    v = spark.read.parquet(f"{d}/verdicts")
    assert {"keep", "keep_dedup", "keep_quality"} <= set(v.columns)
    assert v.count() == docs.count()

    assert cli.main(["pipeline", "clean", f"{d}/docs", f"{d}/kept", "--apply",
                     "--languages", "en", "es"]) == 0
    kept = spark.read.parquet(f"{d}/kept")
    assert "text" in kept.columns
    from clarite_python_spark.operators.pipeline import clean_corpus

    want = clean_corpus(docs, languages=("en", "es")).where("keep").count()
    assert kept.count() == want < docs.count()


def test_cli_pipeline_duplicate_spans_and_zorder(spark, tmp_path):
    d = str(tmp_path)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(f"{d}/docs")

    assert cli.main(["pipeline", "duplicate-spans", f"{d}/docs", f"{d}/spans",
                     "--ngram", "16"]) == 0
    spans = spark.read.parquet(f"{d}/spans")
    assert {"dup_windows", "dup_tokens", "dup_fraction"} <= set(spans.columns)
    assert spans.count() == docs.count()

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.write.parquet(f"{d}/li")
    assert cli.main(["pipeline", "zorder", f"{d}/li", f"{d}/li_z",
                     "--by", "l_extendedprice", "l_quantity",
                     "--partitions", "2"]) == 0
    z = spark.read.parquet(f"{d}/li_z")
    assert z.count() == li.count()
    assert z.columns == li.columns


def test_cli_pipeline_mixture_and_text_ops(spark, tmp_path):
    """Round-6 additions: domain-cap / mixture / tfidf / bigram-logprob /
    classify-quality."""
    d = str(tmp_path)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = f"{d}/docs"
    docs.write.parquet(src)

    assert cli.main(["pipeline", "domain-cap", src, f"{d}/cap",
                     "--max-docs", "15", "--prefilter-margin", "3.0"]) == 0
    cap = spark.read.parquet(f"{d}/cap")
    assert cap.count() == 300 and "cap_rank" in cap.columns

    assert cli.main(["pipeline", "mixture", src, f"{d}/mix",
                     "--tau", "0.5", "--target-rows", "300"]) == 0
    mix = spark.read.parquet(f"{d}/mix")
    assert 0 < mix.count() < docs.count() and "rate_buckets" in mix.columns

    assert cli.main(["pipeline", "tfidf", src, f"{d}/tfidf", "--top-k", "2"]) == 0
    tf = spark.read.parquet(f"{d}/tfidf")
    assert {"term", "tfidf", "rank"} <= set(tf.columns)
    assert tf.groupBy("doc_id").count().agg({"count": "max"}).collect()[0][0] <= 2

    assert cli.main(["pipeline", "bigram-logprob", src, f"{d}/bg"]) == 0
    assert "bits_per_bigram" in spark.read.parquet(f"{d}/bg").columns

    assert cli.main(["pipeline", "classify-quality", src, f"{d}/qc",
                     "--weights", "bias=10.0"]) == 0
    qc = spark.read.parquet(f"{d}/qc")
    assert qc.where("NOT keep").count() == 0  # bias=10 keeps everything


def test_cli_events_group_and_span_removal(spark, tmp_path):
    d = str(tmp_path)
    from clarite_python_spark.sources.io import load_testdata
    ev = load_testdata(spark, "/root/testdata/sf0.001", ["events"])["events"]
    ev.write.parquet(f"{d}/ev")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(f"{d}/docs")

    assert cli.main(["events", "funnel", f"{d}/ev", f"{d}/fun",
                     "--steps", "signup", "view", "purchase"]) == 0
    fun = spark.read.parquet(f"{d}/fun")
    assert {"user_id", "stage", "stage_ts"} <= set(fun.columns)

    assert cli.main(["events", "funnel", f"{d}/ev", f"{d}/func",
                     "--steps", "signup", "view", "purchase", "--counts"]) == 0
    assert spark.read.parquet(f"{d}/func").count() == 3

    assert cli.main(["events", "retention", f"{d}/ev", f"{d}/ret"]) == 0
    ret = spark.read.parquet(f"{d}/ret")
    assert {"cohort_date", "period_offset", "n_users"} <= set(ret.columns)

    assert cli.main(["pipeline", "remove-duplicate-spans", f"{d}/docs",
                     f"{d}/spans", "--ngram", "16"]) == 0
    sp = spark.read.parquet(f"{d}/spans")
    assert {"n_tokens", "removed_tokens", "text_cleaned"} <= set(sp.columns)
    assert sp.count() == docs.count()


def test_cli_source_overlap_and_funnel_times(spark, tmp_path):
    d = str(tmp_path)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(f"{d}/docs")
    from clarite_python_spark.sources.io import load_testdata
    load_testdata(spark, "/root/testdata/sf0.001", ["events"])["events"].write.parquet(f"{d}/ev")

    assert cli.main(["pipeline", "source-overlap", f"{d}/docs", f"{d}/ov",
                     "--granularity", "ngram", "--ngram", "8"]) == 0
    ov = spark.read.parquet(f"{d}/ov")
    assert {"source_a", "source_b", "n_shared", "n_a", "n_b"} <= set(ov.columns)
    assert ov.count() > 0

    assert cli.main(["events", "funnel", f"{d}/ev", f"{d}/ft",
                     "--steps", "signup", "view", "--times"]) == 0
    ft = spark.read.parquet(f"{d}/ft")
    assert {"stage", "stage_ts", "since_prev_us"} <= set(ft.columns)


def test_cli_compact(spark, tmp_path):
    d = str(tmp_path)
    spark.range(50_000).repartition(16).write.parquet(f"{d}/frag")
    assert cli.main(["pipeline", "compact", f"{d}/frag", f"{d}/out",
                     "--target-file-mb", "128"]) == 0
    out = spark.read.parquet(f"{d}/out")
    assert out.count() == 50_000
    import os
    n = len([f for f in os.listdir(f"{d}/out") if f.endswith(".parquet")])
    assert n < 16


def test_cli_lsh_recall(spark, tmp_path):
    d = str(tmp_path)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(f"{d}/docs")
    assert cli.main(["pipeline", "lsh-recall", f"{d}/docs", f"{d}/rec",
                     "--sample-fraction", "0.5"]) == 0
    r = spark.read.parquet(f"{d}/rec").collect()[0]
    assert r["n_sample"] > 0 and r["n_hits"] <= r["n_candidate_pairs"]


def test_cli_ann_recall_multi(spark, tmp_path):
    d = str(tmp_path)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").write.parquet(f"{d}/emb")
    assert cli.main(["pipeline", "ann-recall", f"{d}/emb", f"{d}/rec",
                     "--method", "lsh_multi", "--n-planes", "4", "--n-bands", "8"]) == 0
    r = spark.read.parquet(f"{d}/rec").collect()[0]
    assert r["n_queries"] == 20 and r["recall"] is not None

    # the compression methods route --dim to their projection
    assert cli.main(["pipeline", "ann-recall", f"{d}/emb", f"{d}/rec_rp",
                     "--method", "rp", "--dim", "16"]) == 0
    rp = spark.read.parquet(f"{d}/rec_rp").collect()[0]
    assert rp["recall"] is not None
    assert cli.main(["pipeline", "ann-recall", f"{d}/emb", f"{d}/rec_tr",
                     "--method", "truncated", "--dim", "16"]) == 0
    tr = spark.read.parquet(f"{d}/rec_tr").collect()[0]
    assert tr["recall"] is not None


def test_cli_ivf_tune(spark, tmp_path, capsys):
    d = str(tmp_path)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").write.parquet(f"{d}/emb")
    assert cli.main(["pipeline", "ivf-tune", f"{d}/emb", f"{d}/unused",
                     "--recall-target", "0.8", "--n-lists", "8"]) == 0
    import json as _json

    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 1 <= res["n_probe"] <= 8 and res["recall"] >= 0.8


def test_cli_retention_approx_and_funnel_cap(spark, tmp_path):
    d = str(tmp_path)
    from pyspark.sql import functions as F

    from clarite_python_spark.sources.io import load_testdata

    ev = load_testdata(spark, "/root/testdata/sf0.001", ["events"])["events"]
    ev.where(F.col("ts").isNotNull()).write.parquet(f"{d}/ev")
    assert cli.main(["events", "retention", f"{d}/ev", f"{d}/ret", "--approx"]) == 0
    assert spark.read.parquet(f"{d}/ret").count() > 0
    assert cli.main(["events", "funnel", f"{d}/ev", f"{d}/fun",
                     "--steps", "signup", "view", "purchase",
                     "--max-events-per-user", "1000"]) == 0
    assert spark.read.parquet(f"{d}/fun").count() > 0


def test_cli_epoch_repeat_and_dsir(spark, tmp_path):
    d = str(tmp_path)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(f"{d}/docs")
    docs.where("source = 'src0'").write.parquet(f"{d}/target")
    assert cli.main(["pipeline", "epoch-repeat", f"{d}/docs", f"{d}/rep",
                     "--epochs", "2.0"]) == 0
    assert spark.read.parquet(f"{d}/rep").count() == 2 * docs.count()
    assert cli.main(["pipeline", "dsir", f"{d}/docs", f"{d}/w",
                     "--target", f"{d}/target"]) == 0
    assert spark.read.parquet(f"{d}/w").count() == docs.count()
    assert cli.main(["pipeline", "dsir", f"{d}/docs", f"{d}/s",
                     "--target", f"{d}/target", "--n", "40"]) == 0
    assert spark.read.parquet(f"{d}/s").count() == 40


def test_cli_round7_new_ops(spark, tmp_path):
    """stratified-split / pmi / divergence / quantize / clip-outliers."""
    d = str(tmp_path)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = f"{d}/docs"
    docs.write.parquet(src)

    assert cli.main(["pipeline", "stratified-split", src, f"{d}/ssplit",
                     "--fractions", "train=0.6", "val=0.2", "--by", "source"]) == 0
    out = spark.read.parquet(f"{d}/ssplit")
    per = {(r["source"], r["split"]): r["count"]
           for r in out.groupBy("source", "split").count().collect()}
    # 25 docs/source at sf0.001 -> exactly 15 train / 5 val / 5 held out
    assert per[("src0", "train")] == 15 and per[("src0", "val")] == 5

    assert cli.main(["pipeline", "pmi", src, f"{d}/pmi",
                     "--k", "10", "--min-count", "3"]) == 0
    pmi = spark.read.parquet(f"{d}/pmi")
    assert pmi.count() == 10 and {"w1", "w2", "pmi", "rank"} <= set(pmi.columns)

    b = f"{d}/docs_b"
    docs.where("source >= 'src5'").write.parquet(b)
    assert cli.main(["pipeline", "divergence", src, b, f"{d}/div"]) == 0
    row = spark.read.parquet(f"{d}/div").collect()[0]
    assert row["js"] >= 0.0 and row["v"] > 0

    assert cli.main(["pipeline", "dedup", src, f"{d}/shd", "--method", "simhash"]) == 0
    shd = spark.read.parquet(f"{d}/shd")
    assert 0 < shd.count() <= spark.read.parquet(src).count()

    assert cli.main(["pipeline", "normalize", src, f"{d}/norm"]) == 0
    norm = spark.read.parquet(f"{d}/norm")
    assert norm.count() == spark.read.parquet(src).count()
    assert set(norm.columns) == set(spark.read.parquet(src).columns)

    assert cli.main(["pipeline", "dedup-report", src, f"{d}/dr"]) == 0
    dr = spark.read.parquet(f"{d}/dr")
    assert {"source", "n_docs", "n_in_clusters", "n_dropped", "n_clusters",
            "max_cluster"} <= set(dr.columns)
    assert dr.count() == 20

    assert cli.main(["pipeline", "novelty", src, f"{d}/nov"]) == 0
    nov = spark.read.parquet(f"{d}/nov")
    assert {"doc_id", "n_grams", "n_novel", "novelty"} <= set(nov.columns)
    assert nov.count() == spark.read.parquet(src).count()

    assert cli.main(["pipeline", "card", src, f"{d}/card"]) == 0
    card = spark.read.parquet(f"{d}/card")
    assert {"source", "n_docs", "dup_rate", "top_lang", "mean_quality"} <= set(card.columns)
    assert card.count() == 20  # 20 sources at sf0.001

    emb = f"{d}/emb"
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").write.parquet(emb)
    assert cli.main(["pipeline", "cluster", emb, f"{d}/clus", "--k", "8"]) == 0
    clus = spark.read.parquet(f"{d}/clus")
    assert {"vec_id", "cluster", "cosine"} <= set(clus.columns)
    assert clus.count() == spark.read.parquet(emb).count()
    assert cli.main(["pipeline", "quantize", emb, f"{d}/q8"]) == 0
    q = spark.read.parquet(f"{d}/q8")
    assert q.schema["qvec"].dataType.simpleString() == "array<tinyint>"
    assert q.count() == spark.read.parquet(emb).count()


def test_cli_clip_outliers(spark, tmp_path, tsv_file):
    d = str(tmp_path)
    assert cli.main(["load", "from-tsv", tsv_file, f"{d}/pq"]) == 0
    assert cli.main(["modify", "clip-outliers", f"{d}/pq", f"{d}/clipped",
                     "--method", "iqr", "--cutoff", "0.5", "--only", "signal"]) == 0
    before = from_parquet(spark, f"{d}/pq").df.selectExpr(
        "max(signal) AS mx").collect()[0]["mx"]
    after = from_parquet(spark, f"{d}/clipped").df.selectExpr(
        "max(signal) AS mx", "count(signal) AS n").collect()[0]
    assert after["mx"] <= before and after["n"] > 0


def test_cli_incremental_dedup_methods(spark, tmp_path):
    d = str(tmp_path)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.where("doc_id < 25").write.parquet(f"{d}/seen")
    docs.where("doc_id >= 25").write.parquet(f"{d}/new")
    n_new = docs.where("doc_id >= 25").count()

    for method in ("exact", "minhash", "simhash"):
        assert cli.main(["pipeline", "incremental-dedup", f"{d}/new", f"{d}/seen",
                         f"{d}/out_{method}", "--method", method]) == 0
        n = spark.read.parquet(f"{d}/out_{method}").count()
        assert 0 < n <= n_new, method

    # simhash against a persisted LONG fingerprint table
    from clarite_python_spark.operators.dedup import simhash_fingerprints
    simhash_fingerprints(spark.read.parquet(f"{d}/seen")).write.parquet(f"{d}/fps")
    assert cli.main(["pipeline", "incremental-dedup", f"{d}/new", f"{d}/fps",
                     f"{d}/out_fp", "--method", "simhash", "--seen-fp-col", "fp"]) == 0
    a = sorted(r["doc_id"] for r in spark.read.parquet(f"{d}/out_fp").collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(f"{d}/out_simhash").collect())
    assert a == b


def test_cli_dedup_keep_policy_flags(spark, tmp_path):
    """pipeline dedup --keep/--keep-order/--transitive route through the
    unified dedup() dispatcher with one survivor-policy vocabulary."""
    d = str(tmp_path)
    src = f"{d}/docs"
    spark.createDataFrame(
        [
            (1, "alpha beta gamma", 3),
            (2, "alpha  beta gamma", 9),  # same normalized text, longer
            (3, "something else entirely", 1),
        ],
        "doc_id: long, text: string, n_chars: int",
    ).write.parquet(src)

    assert cli.main(["pipeline", "dedup", src, f"{d}/kl",
                     "--keep", "n_chars"]) == 0
    kept = sorted(r["doc_id"] for r in spark.read.parquet(f"{d}/kl").collect())
    assert kept == [2, 3]

    assert cli.main(["pipeline", "dedup", src, f"{d}/km",
                     "--keep", "n_chars", "--keep-order", "min"]) == 0
    kept = sorted(r["doc_id"] for r in spark.read.parquet(f"{d}/km").collect())
    assert kept == [1, 3]

    # --transitive on a near-dup method runs end-to-end
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(f"{d}/real")
    assert cli.main(["pipeline", "dedup", f"{d}/real", f"{d}/tr",
                     "--method", "minhash", "--transitive"]) == 0
    assert 0 < spark.read.parquet(f"{d}/tr").count() <= docs.count()

    # --transitive on exact is a loud error, not a silent ignore
    with pytest.raises(ValueError, match="transitive"):
        cli.main(["pipeline", "dedup", src, f"{d}/bad", "--transitive"])


def test_cli_round9_pq_and_mixture(spark, tmp_path):
    """pipeline pq-encode / mixture-report / ann-recall --method pq and
    ivf_pq front ends."""
    d = str(tmp_path)
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    docs = "/root/testdata/sf0.001/documents.parquet"

    assert cli.main(
        ["pipeline", "pq-encode", emb, f"{d}/pq", "--m", "4", "--k-sub", "8"]
    ) == 0
    out = spark.read.parquet(f"{d}/pq")
    assert set(out.columns) == {"vec_id", "pq_code", "recon_cosine"}
    assert out.count() == spark.read.parquet(emb).count()

    assert cli.main(
        [
            "pipeline", "mixture-report", docs, f"{d}/mix",
            "--budget-tokens", "100000", "--tau", "0.5", "--max-epochs", "2",
        ]
    ) == 0
    mix = spark.read.parquet(f"{d}/mix")
    assert "effective_epochs" in mix.columns and "lost_tokens" in mix.columns

    assert cli.main(
        [
            "pipeline", "ann-recall", emb, f"{d}/rec",
            "--method", "ivf_pq", "--m", "4", "--k-sub", "8",
            "--n-lists", "8", "--n-probe", "4", "--n-queries", "5",
        ]
    ) == 0
    r = spark.read.parquet(f"{d}/rec").first()
    assert 0.0 <= r["recall"] <= 1.0


def test_cli_bm25_and_fuzzy_join(spark, tmp_path):
    d = str(tmp_path)
    docs = "/root/testdata/sf0.001/documents.parquet"
    parts = "/root/testdata/sf0.001/part.parquet"

    assert cli.main(
        ["pipeline", "bm25", docs, f"{d}/bm", "--queries",
         "hash join merge;slow scan filter", "--k", "5"]
    ) == 0
    bm = spark.read.parquet(f"{d}/bm")
    assert set(bm.columns) == {"query_id", "doc_id", "rank", "bm25"}
    assert bm.where("rank = 1").count() == 2

    assert cli.main(
        ["pipeline", "fuzzy-join", parts, parts, f"{d}/fj",
         "--left-col", "p_name", "--right-col", "p_name",
         "--max-distance", "1"]
    ) == 0
    fj = spark.read.parquet(f"{d}/fj")
    assert "distance" in fj.columns and fj.count() > 0

    # stored-postings round trip: build once, query the artifact, and
    # the result must equal the inline run exactly
    assert cli.main(["pipeline", "build-postings", docs, f"{d}/post"]) == 0
    assert cli.main(
        ["pipeline", "bm25", docs, f"{d}/bm2", "--queries",
         "hash join merge;slow scan filter", "--k", "5",
         "--postings-dir", f"{d}/post"]
    ) == 0
    bm2 = spark.read.parquet(f"{d}/bm2")
    assert sorted(map(tuple, bm2.collect())) == sorted(map(tuple, bm.collect()))

    # rrf: fuse the two bm25 runs (identical rankings -> same docs,
    # doubled reciprocal scores, same order)
    assert cli.main(
        ["pipeline", "rrf", f"{d}/bm", f"{d}/bm2", f"{d}/fused", "--k", "3"]
    ) == 0
    fused = spark.read.parquet(f"{d}/fused")
    assert set(fused.columns) == {"query_id", "doc_id", "rank", "rrf"}
    top = {(r["query_id"], r["rank"]): r["doc_id"] for r in fused.collect()}
    orig = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in bm.where("rank <= 3").collect()
    }
    assert top == orig

    # a lone --block-left (or --block-right) must be a parser error, not
    # a silent fall-back to the much more expensive length-band-only join
    for lone in (["--block-left", "p_mfgr"], ["--block-right", "p_mfgr"]):
        with pytest.raises(SystemExit):
            cli.main(
                ["pipeline", "fuzzy-join", parts, parts, f"{d}/fj_lone",
                 "--left-col", "p_name", "--right-col", "p_name",
                 "--max-distance", "1", *lone]
            )


def test_cli_round10_ops(spark, tmp_path):
    d = str(tmp_path)
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    orders = "/root/testdata/sf0.001/orders.parquet"

    # cc + sizes over a path graph derived from orders keys
    spark.read.parquet(orders).selectExpr(
        "o_orderkey AS src", "o_orderkey - 1 AS dst"
    ).where("o_orderkey % 5 != 0").write.parquet(f"{d}/edges")
    assert cli.main(["pipeline", "cc", f"{d}/edges", f"{d}/cc"]) == 0
    cc = spark.read.parquet(f"{d}/cc")
    assert set(cc.columns) == {"node", "component"}
    assert cli.main(
        ["pipeline", "cc", f"{d}/edges", f"{d}/ccs", "--sizes"]
    ) == 0
    sizes = spark.read.parquet(f"{d}/ccs")
    assert set(sizes.columns) == {"component", "n_nodes"}
    assert cc.count() == sizes.agg({"n_nodes": "sum"}).first()[0]

    # table-diff: old vs a restated copy of itself
    spark.read.parquet(orders).where("o_orderkey % 2 = 0").selectExpr(
        "o_orderkey", "o_totalprice + 1.0 AS o_totalprice", "o_orderstatus"
    ).write.parquet(f"{d}/new")
    assert cli.main(
        ["pipeline", "table-diff", orders, f"{d}/new", f"{d}/diff",
         "--keys", "o_orderkey", "--compare", "o_totalprice,o_orderstatus"]
    ) == 0
    diff = spark.read.parquet(f"{d}/diff")
    stats = {r["status"] for r in diff.select("status").distinct().collect()}
    assert stats == {"removed", "changed"}
    assert diff.where("status = 'changed'").first()["changed_cols"] == "o_totalprice"

    # mmr then rank-eval of its output against self-label qrels
    spark.read.parquet(emb).where("vec_id < 2").selectExpr(
        "vec_id AS query_id", "embedding"
    ).write.parquet(f"{d}/q")
    assert cli.main(
        ["pipeline", "mmr", emb, f"{d}/q", f"{d}/mmr",
         "--k", "3", "--fetch-k", "8", "--lambda", "0.5"]
    ) == 0
    mmr = spark.read.parquet(f"{d}/mmr")
    assert set(mmr.columns) == {"query_id", "vec_id", "rank", "mmr"}
    assert mmr.count() == 6

    spark.sql(
        "SELECT a.vec_id AS query_id, b.vec_id AS vec_id, 1.0 AS rel "
        f"FROM parquet.`{emb}` a JOIN parquet.`{emb}` b ON a.label = b.label "
        "WHERE a.vec_id < 2"
    ).write.parquet(f"{d}/qrels")
    assert cli.main(
        ["pipeline", "rank-eval", f"{d}/mmr", f"{d}/qrels", f"{d}/ev",
         "--k", "3", "--doc-col", "vec_id"]
    ) == 0
    ev = spark.read.parquet(f"{d}/ev")
    assert ev.count() == 2
    row = ev.first()
    assert 0.0 <= row["ndcg"] <= 1.0 and row["n_rel"] > 0


def test_cli_mmr_query_col(spark, tmp_path):
    """--query-col: a queries table whose id column is not 'query_id'."""
    d = str(tmp_path)
    emb = "/root/testdata/sf0.001/embeddings.parquet"
    spark.read.parquet(emb).where("vec_id < 2").selectExpr(
        "vec_id AS qid", "embedding"
    ).write.parquet(f"{d}/q")
    assert cli.main(
        ["pipeline", "mmr", emb, f"{d}/q", f"{d}/mmr",
         "--k", "3", "--fetch-k", "8", "--query-col", "qid"]
    ) == 0
    out = spark.read.parquet(f"{d}/mmr")
    assert set(out.columns) == {"qid", "vec_id", "rank", "mmr"}
    assert out.count() == 6
