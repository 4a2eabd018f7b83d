"""CLI entry: ``python -m zipkin_dependencies_spark [yyyy-MM-dd]``.

The Spark-native replacement for the reference's
``STORAGE_TYPE=<backend> java -jar zipkin-dependencies.jar [date]``
(main/src/main/java/zipkin2/dependencies/ZipkinDependenciesJob.java:21-87).
Environment surface (see config.engine_env): STORAGE_TYPE picks the parity
profile, SPANS_PATH/LINKS_PATH the storage locations, SPAN_FORMAT the source
adapter (parquet|json|v1), DAY_FILTER/STRICT_TRACE_ID override the profile,
SPARK_MASTER/SPARK_CONF/ZIPKIN_LOG_LEVEL the session.
"""

from __future__ import annotations

import logging
import sys

from .config import engine_env, micros_day_repr
from .plans.job import DependencyLinksJob, JobConfig


USAGE = """usage: python -m zipkin_dependencies_spark [yyyy-MM-dd]

Aggregates service dependency links for one UTC day (default: today).
Configuration is environment-driven, mirroring the reference jar:

  SPANS_PATH        span table location (required for file formats)
  LINKS_PATH        link sink location (optional: print instead of write)
  SPAN_FORMAT       parquet | json | v1 | es | cassandra | mysql (default parquet)
  STORAGE_TYPE      cassandra3 | mysql | elasticsearch | opensearch parity profile
  DAY_FILTER        trace_root | span_window | day_partition (profile default)
  STRICT_TRACE_ID   false => group by low 64 bits (profile default)
  LINKS_SINK        backend => write links back through the live connector
  SPARK_MASTER, SPARK_CONF, ZIPKIN_LOG_LEVEL     session controls

Live formats (es | cassandra | mysql) read through the reference's connector
surface (ES_HOSTS/ES_USERNAME/..., CASSANDRA_CONTACT_POINTS/...,
MYSQL_HOST/...) and need the matching connector jar on the classpath; the
file formats are self-contained.
"""


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("-h", "--help"):
        print(USAGE)
        return 0
    env = engine_env(day_arg=argv[0] if argv else None)

    logging.basicConfig(level=getattr(logging, env.log_level.upper(), logging.INFO))
    log = logging.getLogger("zipkin_dependencies_spark")

    from pyspark.sql import SparkSession

    from .session import get_spark
    from .sources import read_spans_json, read_spans_parquet
    from .sources.v1 import v1_to_v2_spans

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(master=env.master, extra_conf=env.spark_conf)
    spark.sparkContext.setLogLevel("WARN" if env.log_level == "INFO" else env.log_level)

    day = micros_day_repr(env.day_ms)
    log.info("Running dependency links for %s (filter=%s strict=%s)",
             day, env.day_filter.value, env.strict_trace_id)

    import os as _os

    environ = dict(_os.environ)
    clustered_scan = False
    if env.source_format == "v1":
        spans_df = v1_to_v2_spans(
            spark.read.parquet(f"{env.spans_path}/zipkin_spans"),
            spark.read.parquet(f"{env.spans_path}/zipkin_annotations"),
        )
    elif env.source_format == "json":
        spans_df = read_spans_json(spark, env.spans_path)
    elif env.source_format == "es":
        from .sources.backends import es_conf_from_env, read_spans_es

        flavor = (
            "opensearch"
            if environ.get("STORAGE_TYPE") == "opensearch"
            else "elasticsearch"
        )
        spans_df = read_spans_es(
            spark,
            day,
            index_prefix=environ.get("ES_INDEX", "zipkin"),
            date_separator=environ.get("ES_DATE_SEPARATOR", "-"),
            conf=es_conf_from_env(environ, flavor=flavor),
            flavor=flavor,
        )
    elif env.source_format == "cassandra":
        from .sources.backends import (
            cassandra_scan_is_trace_clustered,
            read_spans_cassandra,
        )

        spans_df = read_spans_cassandra(
            spark, keyspace=environ.get("CASSANDRA_KEYSPACE", "zipkin2")
        )
        # strict-mode token-range scans co-locate complete traces: the
        # linker can skip its span-scale shuffle (the spanBy parity path)
        clustered_scan = cassandra_scan_is_trace_clustered(env.strict_trace_id)
    elif env.source_format == "mysql":
        from .sources.backends import mysql_config_from_env, read_spans_mysql

        lo = env.day_ms * 1000
        spans_df = read_spans_mysql(
            spark,
            mysql_config_from_env(environ),
            start_us=lo,
            end_us=lo + 86_400_000_000 - 1,
        )
    else:
        spans_df = read_spans_parquet(spark, env.spans_path)

    job = DependencyLinksJob(
        spark,
        JobConfig(
            day=day,
            spans_path=env.spans_path,
            links_path=env.links_path,
            day_filter=env.day_filter,
            strict_trace_id=env.strict_trace_id,
            clustered=clustered_scan,
        ),
    )
    links = job.run(spans_df)
    if environ.get("LINKS_SINK") == "backend":
        from .sources import backends as _b

        if env.source_format == "es":
            flavor = (
                "opensearch"
                if environ.get("STORAGE_TYPE") == "opensearch"
                else "elasticsearch"
            )
            _b.write_links_es(
                links, day,
                index_prefix=environ.get("ES_INDEX", "zipkin"),
                date_separator=environ.get("ES_DATE_SEPARATOR", "-"),
                conf=_b.es_conf_from_env(environ, flavor=flavor),
                flavor=flavor,
            )
        elif env.source_format == "cassandra":
            _b.write_links_cassandra(
                links, day, keyspace=environ.get("CASSANDRA_KEYSPACE", "zipkin2")
            )
        elif env.source_format == "mysql":
            _b.write_links_mysql(links, day, _b.mysql_config_from_env(environ))
        log.info("Wrote day=%s back to %s", day, env.source_format)
    elif env.links_path is None:
        links.show(100, truncate=False)  # no sink configured: print like a REPL
    else:
        log.info("Wrote day=%s to %s", day, env.links_path)
    if not preexisting:  # embedded callers (tests, notebooks) own their session
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
