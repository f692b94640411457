import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


@pytest.fixture(scope="session")
def spark():
    from osmptparser_spark.session import get_spark

    s = get_spark(
        app_name="osmptparser-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture(scope="session")
def entity_dfs(spark):
    """Fixture entity DataFrames (nodes/ways/relations) from the pinned
    decoded test.pbf JSON."""
    from tests.fixture_util import load_entities

    data = load_entities()
    nodes = spark.createDataFrame(
        [(n["id"], n["lat"], n["lon"], n["tags"]) for n in data["nodes"]],
        "id BIGINT, lat DOUBLE, lon DOUBLE, tags MAP<STRING,STRING>",
    )
    ways = spark.createDataFrame(
        [(w["id"], w["tags"], w["info"], w["refs"]) for w in data["ways"]],
        "id BIGINT, tags MAP<STRING,STRING>, info MAP<STRING,STRING>, refs ARRAY<BIGINT>",
    )
    relations = spark.createDataFrame(
        [
            (
                r["id"],
                r["tags"],
                r["info"],
                [m[1] for m in r["members"] if m[2] == "way"],
                [m[1] for m in r["members"] if m[2] == "node"],
            )
            for r in data["relations"]
        ],
        "id BIGINT, tags MAP<STRING,STRING>, info MAP<STRING,STRING>, "
        "way_refs ARRAY<BIGINT>, stop_refs ARRAY<BIGINT>",
    )
    return nodes, ways, relations


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
