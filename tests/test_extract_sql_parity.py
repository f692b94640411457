"""SQL (pure Catalyst) extraction must agree with the pandas/Arrow
extraction on the reference fixture — real OSM tags with unicode,
quotes, commas — and on synthetic pages."""

import pytest

from osmptparser_spark.sources import pages as P
from tests.fixture_util import load_entities


@pytest.fixture(scope="module")
def fixture_pages(spark):
    data = load_entities()
    return P.pages_df(
        spark, P.entities_to_pages(data["nodes"], data["ways"], data["relations"])
    ).cache()


def _rows(df, key="id"):
    return sorted((r.asDict(recursive=True) for r in df.collect()), key=lambda d: d[key])


@pytest.mark.parametrize("from_html", [True, False])
def test_sql_equals_pandas_on_fixture(fixture_pages, from_html):
    for sql_fn, pd_fn in [
        (P.extract_nodes_sql, P.extract_nodes),
        (P.extract_ways_sql, P.extract_ways),
        (P.extract_relations_sql, P.extract_relations),
    ]:
        got = _rows(sql_fn(fixture_pages, from_html))
        want = _rows(pd_fn(fixture_pages, from_html))
        assert got == want, sql_fn.__name__


def test_sql_handles_pipes_inside_node_tags(spark):
    # node lines are immune to pipes in tag values (split limit)
    nodes = [{"id": 1, "lat": 1.5, "lon": 2.5, "tags": {"name": "a|b|c", "k": "v"}}]
    pages = P.pages_df(spark, P.entities_to_pages(nodes, [], []))
    row = P.extract_nodes_sql(pages).collect()[0]
    assert dict(row.tags) == {"name": "a|b|c", "k": "v"}
    row2 = P.extract_nodes(pages).collect()[0]
    assert dict(row2.tags) == dict(row.tags)


def test_pandas_path_handles_pipes_in_way_tags(spark):
    # the documented SQL-path limitation: '}|{'-free pipes still fine
    ways = [{"id": 7, "tags": {"note": "x|y"}, "info": {"k": "1"}, "refs": [1, 2]}]
    pages = P.pages_df(spark, P.entities_to_pages([], ways, []))
    for fn in (P.extract_ways, P.extract_ways_sql):
        row = fn(pages).collect()[0]
        assert dict(row.tags) == {"note": "x|y"}
        assert dict(row.info) == {"k": "1"}
        assert list(row.refs) == [1, 2]
