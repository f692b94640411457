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


def test_write_pbf_round_trip(tmp_path):
    """Encoder/decoder round trip on the deterministic mini-city:
    multi-block file, dense nodes with/without tags, ways, relations
    with mixed member types — exact id/tag/ref/member equality,
    coordinates to the 1e-7 wire lattice."""
    import __spark_entry__ as e
    from osmptparser_spark.sources.pbf import read_pbf, write_pbf

    nodes, ways, rels = e._area_city_entities()
    rel_m = [
        {
            "id": r["id"],
            "tags": r["tags"],
            "members": [("", w, "way") for w in r["way_refs"]]
            + [("stop", s, "node") for s in r["stop_refs"]],
        }
        for r in rels
    ]
    path = str(tmp_path / "city.pbf")
    n_blobs = write_pbf(path, nodes, ways, rel_m, entities_per_block=10)
    assert n_blobs > 3  # header + several data blocks
    out = read_pbf(path)
    nd = {n["id"]: n for n in out.nodes}
    assert len(nd) == len(nodes)
    for n in nodes:
        got = nd[n["id"]]
        assert abs(got["lat"] - n["lat"]) < 5e-8
        assert abs(got["lon"] - n["lon"]) < 5e-8
        assert got["tags"] == n["tags"]
    wd = {w["id"]: w for w in out.ways}
    assert len(wd) == len(ways)
    for w in ways:
        assert wd[w["id"]]["refs"] == w["refs"]
        assert wd[w["id"]]["tags"] == w["tags"]
    rd = {r["id"]: r for r in out.relations}
    assert len(rd) == len(rel_m)
    for r in rel_m:
        assert rd[r["id"]]["members"] == r["members"]
        assert rd[r["id"]]["tags"] == r["tags"]


def test_write_pbf_matches_reference_fixture_decode(tmp_path):
    """Re-encode the reference fixture's decoded entities and decode
    them back: the writer speaks the same wire dialect the reference's
    osmpbf stack produced (negative coords, multi-byte varints, dense
    tag runs, member roles)."""
    from osmptparser_spark.sources.pbf import read_pbf, write_pbf
    from tests.fixture_util import load_entities

    ent = load_entities()
    nodes = ent["nodes"]
    ways = ent["ways"]
    rels = ent["relations"]
    path = str(tmp_path / "ref.pbf")
    write_pbf(path, nodes, ways, rels, entities_per_block=200)
    out = read_pbf(path)
    assert len(out.nodes) == len(nodes)
    assert len(out.ways) == len(ways)
    assert len(out.relations) == len(rels)
    nd = {n["id"]: n for n in out.nodes}
    for n in nodes:
        assert abs(nd[n["id"]]["lat"] - n["lat"]) < 5e-8
        assert nd[n["id"]]["tags"] == n["tags"]
    rd = {r["id"]: r for r in out.relations}
    for r in rels:
        assert [tuple(m) for m in rd[r["id"]]["members"]] == [
            tuple(m) for m in r["members"]
        ]
