"""Distributed PBF read: blob-index scan + executor-side decode."""

import os

import pytest

from tests.fixture_util import REFERENCE_PBF, load_entities


@pytest.mark.skipif(not os.path.exists(REFERENCE_PBF), reason="reference absent")
def test_read_pbf_spark_matches_pinned(spark):
    from osmptparser_spark.sources.pbf import read_pbf_spark

    nodes, ways, relations = read_pbf_spark(spark, REFERENCE_PBF)
    pinned = load_entities()
    assert nodes.count() == len(pinned["nodes"])
    assert ways.count() == len(pinned["ways"])
    rels = {r.id: r for r in relations.collect()}
    assert set(rels) == {85965, 2030162}
    pr = {r["id"]: r for r in pinned["relations"]}
    for rid, row in rels.items():
        assert row.way_refs == [m[1] for m in pr[rid]["members"] if m[2] == "way"]
        assert row.stop_refs == [m[1] for m in pr[rid]["members"] if m[2] == "node"]
        assert dict(row.tags) == pr[rid]["tags"]
        assert dict(row.info) == pr[rid]["info"]
