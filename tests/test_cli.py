"""CLI entry (`python -m zipkin_dependencies_spark`) — env-driven end to end,
the Spark-native analog of the reference's main() dispatch
(ZipkinDependenciesJob.java:21-87)."""

from __future__ import annotations

import datetime as dt

from tests.conftest import make_span


def test_cli_main_writes_day_partition(spark, spans_df_factory, tmp_path, monkeypatch):
    import zipkin_dependencies_spark.__main__ as cli

    spans_path = str(tmp_path / "spans")
    links_path = str(tmp_path / "links")
    day = dt.date(2016, 5, 31)
    spans_df_factory(
        [
            make_span(id="1", kind="CLIENT", local="web", remote="api"),
            make_span(id="1", kind="SERVER", local="api", remote="web", shared=True),
        ]
    ).write.mode("overwrite").parquet(spans_path)

    monkeypatch.setenv("STORAGE_TYPE", "cassandra3")
    monkeypatch.setenv("SPANS_PATH", spans_path)
    monkeypatch.setenv("LINKS_PATH", links_path)
    # reuse the session fixture's master; the CLI calls getOrCreate()
    monkeypatch.setenv("SPARK_MASTER", "local[4]")

    assert cli.main(["2016-05-31"]) == 0

    out = spark.read.parquet(links_path).collect()
    assert [(r.day, r.parent, r.child, r.call_count, r.error_count) for r in out] == [
        (day, "web", "api", 1, 0)
    ]


def test_curate_cli_writes_split_partitions(spark, tmp_path):
    """The curation CLI end-to-end: documents in, split-partitioned
    survivor table out; every survivor maps to exactly one split and
    re-running is byte-stable (deterministic decisions)."""
    from zipkin_dependencies_spark import curate as cli

    out = str(tmp_path / "curated")
    assert (
        cli.main(
            [
                "--input", "/root/testdata/sf0.001/documents.parquet",
                "--output", out,
                "--min-quality", "0.3",
                "--split", "train=0.8,val=0.2",
            ]
        )
        == 0
    )
    got = spark.read.parquet(out)
    assert set(got.select("split").distinct().toPandas()["split"]) <= {"train", "val"}
    n1 = got.count()
    assert n1 > 0
    # deterministic re-run
    assert cli.main(
        ["--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out, "--min-quality", "0.3",
         "--split", "train=0.8,val=0.2"]
    ) == 0
    assert spark.read.parquet(out).count() == n1


def test_curate_cli_incremental_appends_only_new_content(spark, tmp_path):
    """--existing mode: a delta crawl containing the ORIGINAL corpus plus
    new documents appends only the new content's survivors; re-running the
    same increment appends nothing (fingerprint anti-join idempotence)."""
    from pyspark.sql import functions as F

    from zipkin_dependencies_spark import curate as cli

    out = str(tmp_path / "store")
    base_in = "/root/testdata/sf0.001/documents.parquet"
    common = ["--min-quality", "0.3", "--split", "train=1.0"]

    assert cli.main(["--input", base_in, "--output", out, *common]) == 0
    n_base = spark.read.parquet(out).count()
    assert n_base > 0

    # delta crawl = old corpus + genuinely new docs (re-keyed, edited text)
    delta_in = str(tmp_path / "delta")
    docs = spark.read.parquet(base_in)
    new_docs = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" fresh crawl content")).alias("text"),
        "lang", "source", "n_chars",
    )
    docs.unionByName(new_docs).write.mode("overwrite").parquet(delta_in)

    assert cli.main(
        ["--input", delta_in, "--output", out, "--existing", out, *common]
    ) == 0
    n_incr = spark.read.parquet(out).count()
    assert n_incr > n_base  # new content landed
    # old content did NOT duplicate: every fingerprint still appears once
    fp = spark.read.parquet(out).groupBy("fingerprint").count()
    assert fp.filter(F.col("count") > 1).count() == 0

    # idempotent: the same increment again appends nothing
    assert cli.main(
        ["--input", delta_in, "--output", out, "--existing", out, *common]
    ) == 0
    assert spark.read.parquet(out).count() == n_incr


def test_curate_cli_gopher_gate(spark, tmp_path):
    """--gate gopher routes through curate_v3 with --gopher threshold
    overrides; unknown keys die with an argparse error, not a stack."""
    import pytest

    from zipkin_dependencies_spark import curate as cli

    out = str(tmp_path / "curated_gopher")
    assert cli.main(
        ["--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out, "--gate", "gopher",
         "--gopher", "min_words=30", "--gopher", "min_stop_hits=1",
         "--split", "train=0.8,val=0.2"]
    ) == 0
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert set(got.columns) >= {"keep_id", "fingerprint", "quality",
                                "n_copies", "split"}

    with pytest.raises(SystemExit):
        cli.main(
            ["--input", "/root/testdata/sf0.001/documents.parquet",
             "--output", out, "--gate", "gopher",
             "--gopher", "bogus=1"]
        )


def test_curate_cli_gopher_bad_value_is_argparse_error(tmp_path):
    import pytest

    from zipkin_dependencies_spark import curate as cli

    with pytest.raises(SystemExit):
        cli.main(
            ["--input", "/root/testdata/sf0.001/documents.parquet",
             "--output", str(tmp_path / "x"), "--gate", "gopher",
             "--gopher", "min_words=abc"]
        )


def test_curate_cli_rejects_cross_gate_flags(tmp_path):
    """--gate gopher + --min-quality (and the inverse mix) must error, not
    silently drop the flag — a misconfigured run would otherwise proceed
    with a different gate than the operator believes (ADVICE r04)."""
    import pytest

    from zipkin_dependencies_spark import curate as cli

    docs = "/root/testdata/sf0.001/documents.parquet"
    with pytest.raises(SystemExit):
        cli.main(
            ["--input", docs, "--output", str(tmp_path / "a"),
             "--gate", "gopher", "--min-quality", "0.9"]
        )
    with pytest.raises(SystemExit):
        cli.main(
            ["--input", docs, "--output", str(tmp_path / "b"),
             "--gate", "gopher", "--max-dup-3gram", "0.2"]
        )
    with pytest.raises(SystemExit):
        cli.main(
            ["--input", docs, "--output", str(tmp_path / "c"),
             "--gopher", "min_words=30"]
        )


def test_bench_clean_window_predicate():
    """The steal-aware retry trigger: sub-second jitter is tolerated, a
    sustained quarter-core of theft is not."""
    import bench

    assert bench.clean_window(0.2, 0.4)      # jitter under the floor
    assert not bench.clean_window(0.2, 0.6)  # floor exceeded
    assert bench.clean_window(10.0, 2.4)     # < 25% of elapsed
    assert not bench.clean_window(10.0, 2.6)
    assert not bench.clean_window(154.0, 322.4)  # the r04 driver window
