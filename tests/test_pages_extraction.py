"""Pages synthesis + extraction (W1): byte-identical text invariant and
round-trip of the full fixture entity set through the page microformat,
then the whole pipeline pages -> extract -> stitch reproducing goldens."""

import hashlib
import json

import pytest

from osmptparser_spark.engine import get_public_transports
from osmptparser_spark.functions.tagfilter import PTV2_FILTER
from osmptparser_spark.sources import pages as P
from tests.fixture_util import load_entities


def _sha16(obj):
    return hashlib.sha256(json.dumps(obj).encode()).hexdigest()[:16]


@pytest.fixture(scope="module")
def fixture_pages(spark):
    data = load_entities()
    rows = P.entities_to_pages(data["nodes"], data["ways"], data["relations"])
    return P.pages_df(spark, rows).cache()


class TestInvariant:
    def test_byte_identical_text_per_url(self, fixture_pages):
        # recover text from html executor-side and compare to the text col
        from pyspark.sql import functions as F

        df = fixture_pages.withColumn(
            "recovered",
            F.expr(
                f"substring(decode(html, 'UTF-8'), {len(P.PAGE_PREFIX) + 1}, "
                f"length(decode(html, 'UTF-8')) - {len(P.PAGE_PREFIX) + len(P.PAGE_SUFFIX)})"
            ),
        )
        assert df.filter("recovered != text").count() == 0
        assert df.count() > 0

    def test_urls_unique_and_deterministic(self, spark, fixture_pages):
        n = fixture_pages.count()
        assert fixture_pages.select("url").distinct().count() == n
        data = load_entities()
        again = P.entities_to_pages(data["nodes"], data["ways"], data["relations"])
        assert [r[0] for r in again] == [
            r.url for r in fixture_pages.select("url").orderBy("warc_ts").collect()
        ]


class TestExtraction:
    def test_entity_round_trip(self, fixture_pages):
        data = load_entities()
        nodes, ways, relations = P.extract_all(fixture_pages)
        got_nodes = {r.id: r for r in nodes.collect()}
        assert len(got_nodes) == len(data["nodes"])
        for n in data["nodes"]:
            g = got_nodes[n["id"]]
            assert g.lat == n["lat"] and g.lon == n["lon"]  # repr round-trip exact
            assert dict(g.tags) == n["tags"]
        got_ways = {r.id: r for r in ways.collect()}
        for w in data["ways"]:
            g = got_ways[w["id"]]
            assert list(g.refs) == w["refs"]
            assert dict(g.tags) == w["tags"] and dict(g.info) == w["info"]
        got_rels = {r.id: r for r in relations.collect()}
        for r in data["relations"]:
            g = got_rels[r["id"]]
            assert list(g.way_refs) == [m[1] for m in r["members"] if m[2] == "way"]
            assert list(g.stop_refs) == [m[1] for m in r["members"] if m[2] == "node"]
            assert dict(g.tags) == r["tags"] and dict(g.info) == r["info"]

    def test_pages_to_stitched_routes_end_to_end(self, fixture_pages):
        nodes, ways, relations = P.extract_all(fixture_pages)
        df = get_public_transports(nodes, ways, relations, 1500.0, PTV2_FILTER)
        rows = sorted(df.collect(), key=lambda r: r.id)
        assert [r.id for r in rows] == [85965, 2030162]
        assert rows[0].status_code == 501 and len(rows[0].stops) == 31
        assert rows[1].status_code == 0
        assert _sha16([list(s) for s in rows[1].node_seq]) == "825a6368059b6fd6"
