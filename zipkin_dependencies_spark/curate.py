"""CLI entry for the training-data curation pipeline:
``python -m zipkin_dependencies_spark.curate --input docs.parquet --output out/``

The extension-set counterpart of the daily links job's CLI: reads a
documents table (doc_id, text, ...), runs the one-plan curation
composition (scrub → quality/language/repetition gates →
[decontamination if a benchmark table is given] → keep-best near-exact
dedup → reproducible split), and writes the survivor table partitioned by
split — so downstream trainers read ``out/split=train/`` directly and a
re-run with the same inputs is byte-stable (every decision is
content-hash-deterministic; see llm/pipeline.py).
"""

from __future__ import annotations

import argparse
import logging
import sys


def _parse_weights(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, w = part.partition("=")
        if not w:
            raise argparse.ArgumentTypeError(
                f"bad split spec {part!r} (want name=weight,…)"
            )
        out[name.strip()] = float(w)
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m zipkin_dependencies_spark.curate",
        description="Curate a documents table: scrub, gate, decontaminate, "
        "dedup, split — one Spark plan, deterministic re-runs.",
    )
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="output directory (parquet)")
    p.add_argument("--benchmark", help="benchmark/eval parquet for decontamination")
    # Heuristic-gate knobs default to None sentinels so an EXPLICIT flag is
    # distinguishable from the default — a --gate gopher run that also passes
    # --min-quality is a misconfiguration that must error, not silently drop
    # the flag (ADVICE r04). Effective defaults are applied after validation.
    p.add_argument(
        "--min-quality",
        type=float,
        default=None,
        help="heuristic gate only (default 0.4)",
    )
    p.add_argument("--lang", default="en")
    p.add_argument(
        "--max-dup-3gram",
        type=float,
        default=None,
        help="heuristic gate only (default 0.5)",
    )
    p.add_argument("--decontaminate-n", type=int, default=13)
    p.add_argument(
        "--gate",
        choices=("heuristic", "gopher"),
        default="heuristic",
        help="quality gate: 'heuristic' = the v2 score/language/repetition "
        "gate (--min-quality, --max-dup-3gram); 'gopher' = the Gopher "
        "rule set (tune via --gopher)",
    )
    p.add_argument(
        "--gopher",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="Gopher threshold override (repeatable), e.g. "
        "--gopher min_words=30 --gopher min_stop_hits=1; keys are "
        "llm.quality._gopher_measures parameters",
    )
    p.add_argument(
        "--split",
        type=_parse_weights,
        default={"train": 0.9, "val": 0.05, "test": 0.05},
        help="split weights, e.g. train=0.9,val=0.05,test=0.05",
    )
    p.add_argument(
        "--existing",
        help="existing curated store: run INCREMENTALLY — survivors whose "
        "content fingerprint is already present are dropped and the rest "
        "APPENDED to --output (don't re-curate the world for a delta crawl)",
    )
    p.add_argument("--master", default=None, help="spark master override")
    args = p.parse_args(sys.argv[1:] if argv is None else argv)

    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("zipkin_dependencies_spark.curate")

    # flag validation + --gopher parsing run BEFORE the Spark session is
    # created: a misconfigured invocation exits at argparse cost, never
    # after paying JVM startup
    if args.gate == "gopher" and (
        args.min_quality is not None or args.max_dup_3gram is not None
    ):
        p.error(
            "--min-quality/--max-dup-3gram configure the heuristic gate and "
            "have no effect with --gate gopher (use --gopher KEY=VALUE)"
        )
    if args.gate != "gopher" and args.gopher:
        p.error(
            "--gopher overrides configure the gopher gate and have no "
            "effect with --gate heuristic (pass --gate gopher)"
        )
    thresholds: dict[str, float] = {}
    for spec in args.gopher:
        key, _, val = spec.partition("=")
        if not val:
            p.error(f"bad --gopher spec {spec!r} (want key=value)")
        try:
            num = float(val)
        except ValueError:
            p.error(f"bad --gopher value in {spec!r} (want a number)")
        thresholds[key.strip()] = int(num) if num.is_integer() else num

    from .llm.pipeline import curate_v2, curate_v3
    from .session import get_spark

    spark = get_spark(app_name="curate", master=args.master)
    docs = spark.read.parquet(args.input)
    benchmark = (
        spark.read.parquet(args.benchmark)
        if args.benchmark
        # no benchmark table → empty contamination set (same plan, the
        # broadcast anti-join is against zero digests)
        else spark.createDataFrame([], "doc_id bigint, text string")
    )
    if args.gate == "gopher":
        try:
            survivors = curate_v3(
                docs,
                benchmark,
                lang=args.lang,
                decontaminate_n=args.decontaminate_n,
                split_weights=args.split,
                **thresholds,
            )
        except ValueError as ex:  # unknown threshold key: argparse-grade error
            p.error(str(ex))
    else:
        survivors = curate_v2(
            docs,
            benchmark,
            min_quality=0.4 if args.min_quality is None else args.min_quality,
            lang=args.lang,
            max_dup_3gram=(
                0.5 if args.max_dup_3gram is None else args.max_dup_3gram
            ),
            decontaminate_n=args.decontaminate_n,
            split_weights=args.split,
        )
    if args.existing:
        # incremental: the existing store contributes ONLY its fingerprint
        # column (column-pruned scan — the accumulated corpus text is never
        # re-read); the delta's survivors anti-join against it, and the
        # checkpoint pins the delta before the append so reading and
        # appending the same directory cannot race
        existing_fp = (
            spark.read.parquet(args.existing).select("fingerprint").distinct()
        )
        survivors = survivors.join(
            existing_fp, "fingerprint", "left_anti"
        ).localCheckpoint(eager=True)
        survivors.write.mode("append").partitionBy("split").parquet(args.output)
    else:
        (
            survivors.write.mode("overwrite")
            .partitionBy("split")
            .parquet(args.output)
        )
    from pyspark.sql import functions as F

    out = spark.read.parquet(args.output)
    per_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    log.info("curated %s -> %s: %s", args.input, args.output, per_split)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
