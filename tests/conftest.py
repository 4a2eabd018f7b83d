from __future__ import annotations

import datetime as dt

import pytest

from zipkin_dependencies_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


def make_span(
    trace_id="000000000000000a",
    parent_id=None,
    id="0000000000000001",
    kind=None,
    name=None,
    timestamp=1_464_710_316_000_000,  # 2016-05-31T15:18:36Z in µs
    duration=None,
    local=None,
    remote=None,
    tags=None,
    shared=None,
    debug=None,
    day=dt.date(2016, 5, 31),
):
    endpoint = lambda svc: (svc, None, None, None) if svc is not None else None  # noqa: E731
    return (
        trace_id, parent_id, id, kind, name, timestamp, duration,
        endpoint(local), endpoint(remote), None, tags, shared, debug, day,
    )


@pytest.fixture()
def spans_df_factory(spark):
    from zipkin_dependencies_spark.schemas import SPAN_SCHEMA

    def factory(rows):
        return spark.createDataFrame(rows, schema=SPAN_SCHEMA)

    return factory
