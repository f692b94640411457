"""PBF decoder + fixture goldens (FIXTURES.md §3-§4).

Verifies the pure-Python PBF decode against the pinned entity JSON and
the stitch cascade against the golden statuses / point counts / node-
sequence hashes computed for the reference's two PT relations.
"""

import hashlib
import json
import os

import pytest

from osmptparser_spark.operators import stitch_core as sc
from tests.fixture_util import REFERENCE_PBF, hydrate_relation, load_entities


def _sha16(obj):
    return hashlib.sha256(json.dumps(obj).encode()).hexdigest()[:16]


@pytest.fixture(scope="module")
def data():
    return load_entities()


class TestDecoder:
    def test_entity_counts(self, data):
        assert len(data["nodes"]) == 563
        assert len(data["ways"]) == 126
        assert len(data["relations"]) == 2

    @pytest.mark.skipif(
        not os.path.exists(REFERENCE_PBF), reason="reference checkout absent"
    )
    def test_decode_matches_pinned_json(self):
        from osmptparser_spark.sources.pbf import read_pbf

        b = read_pbf(REFERENCE_PBF)
        pinned = load_entities()
        assert [n["id"] for n in b.nodes] == [n["id"] for n in pinned["nodes"]]
        assert [w["id"] for w in b.ways] == [w["id"] for w in pinned["ways"]]
        got = [
            {**r, "members": [tuple(m) for m in r["members"]]} for r in b.relations
        ]
        assert got == pinned["relations"]

    def test_relation_metadata(self, data):
        rels = {r["id"]: r for r in data["relations"]}
        r1, r2 = rels[85965], rels[2030162]
        assert r1["tags"]["name"] == "Trolebus Quitumbe => La Y"
        assert r1["info"]["version"] == "226"
        assert r1["info"]["timestamp"] == "1552883955"
        assert r2["tags"]["name"] == "B6 Mapasingue Oeste Ida"
        assert r2["info"]["version"] == "13"
        assert r2["info"]["timestamp"] == "1555013271"
        # neither has route_master (SURVEY §2.1 quirk 2)
        assert "route_master" not in r1["tags"]
        assert "route_master" not in r2["tags"]


class TestStitchGoldens:
    def test_relation_2030162(self, data):
        rel = next(r for r in data["relations"] if r["id"] == 2030162)
        hyd, stops = hydrate_relation(data, rel)
        assert len(hyd) == 20
        assert len(stops) == 1
        assert _sha16(stops) == "5e81b36cfe1d2f8d"
        for gap in (150.0, 1500.0):
            geom, status = sc.flatten(hyd, gap, closed=False)
            assert status == sc.STATUS_OK
            assert len(geom) == 1
            assert sum(len(s) for s in geom) == 90
            seq = [[n[0] for n in seg] for seg in geom]
            assert _sha16(seq) == "825a6368059b6fd6"
            lon0, lat0 = geom[0][0][2], geom[0][0][1]
            lonN, latN = geom[0][-1][2], geom[0][-1][1]
            assert (round(lon0, 6), round(lat0, 6)) == (-79.930085, -2.155511)
            assert (round(lonN, 6), round(latN, 6)) == (-79.952763, -2.152262)

    def test_relation_85965(self, data):
        rel = next(r for r in data["relations"] if r["id"] == 85965)
        hyd, stops = hydrate_relation(data, rel)
        assert len(hyd) == 106  # platform WAYS included: members are role-blind
        assert len(stops) == 31
        assert _sha16(stops) == "20d4a126e253c6ba"
        for gap in (150.0, 1500.0):
            geom, status = sc.flatten(hyd, gap, closed=False)
            assert status == sc.STATUS_BROKEN
            assert geom == []
        # supporting internals (FIXTURES.md §4)
        fp = sc.first_pass(hyd)
        assert len(fp) == 26
        assert len(sc.join_ways(fp, 150.0)) == 17
        assert len(sc.join_ways(fp, 1500.0)) == 2
        assert len(sc.join_ways(fp, 15000.0)) == 1
