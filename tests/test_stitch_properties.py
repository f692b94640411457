"""Property-based tests (hypothesis) for the stitch cascade invariants."""

from hypothesis import given, settings
from hypothesis import strategies as st

from osmptparser_spark.operators import stitch_core as sc


def chain_ways(n_ways, nodes_per_way, base_id=1):
    """A perfectly chained route: way k shares its last node with way
    k+1's first."""
    ways = []
    nid = base_id
    for _ in range(n_ways):
        way = [(nid + i, (nid + i) * 1e-4, 0.0) for i in range(nodes_per_way)]
        ways.append(way)
        nid += nodes_per_way - 1
    return ways


@st.composite
def perturbed_route(draw):
    n_ways = draw(st.integers(2, 12))
    npw = draw(st.integers(2, 6))
    ways = chain_ways(n_ways, npw)
    # randomly reverse individual ways (osm-normal direction flips)
    for i in range(len(ways)):
        if draw(st.booleans()):
            ways[i] = ways[i][::-1]
    return ways


class TestInvariants:
    @given(perturbed_route())
    @settings(max_examples=200, deadline=None)
    def test_direction_flips_always_stitch_ok(self, ways):
        geom, status = sc.flatten(ways, 150.0, closed=False)
        assert status == sc.STATUS_OK
        assert len(geom) == 1
        # every input node id appears in the output
        in_ids = {n[0] for w in ways for n in w}
        out_ids = {n[0] for n in geom[0]}
        assert out_ids == in_ids

    @given(perturbed_route(), st.integers(0, 10))
    @settings(max_examples=100, deadline=None)
    def test_output_nodes_subset_of_input(self, ways, seed):
        import random

        rnd = random.Random(seed)
        shuffled = ways[:]
        rnd.shuffle(shuffled)
        geom, status = sc.flatten(shuffled, 150.0, closed=False)
        in_ids = {n[0] for w in ways for n in w}
        for seg in geom:
            assert {n[0] for n in seg} <= in_ids
        assert status[0] in (0, 101, 102, 501)

    @given(perturbed_route())
    @settings(max_examples=100, deadline=None)
    def test_deterministic(self, ways):
        assert sc.flatten(ways, 150.0, False) == sc.flatten(ways, 150.0, False)

    @given(perturbed_route())
    @settings(max_examples=100, deadline=None)
    def test_single_run_output_is_a_valid_chain(self, ways):
        geom, status = sc.flatten(ways, 150.0, False)
        if status == sc.STATUS_OK and geom:
            seg = geom[0]
            # consecutive output nodes must be adjacent in SOME input way
            adj = set()
            for w in ways:
                for a, b in zip(w, w[1:]):
                    adj.add((a[0], b[0]))
                    adj.add((b[0], a[0]))
            for a, b in zip(seg, seg[1:]):
                assert (a[0], b[0]) in adj
