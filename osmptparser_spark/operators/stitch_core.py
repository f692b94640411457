"""Way-stitching / gap-fix core (pure Python, no Spark dependency).

Faithful re-implementation of the reference's greedy endpoint-matching
chain assembly — the semantics of ``/root/reference/src/parser/relation.rs``
(``first_pass`` relation.rs:111-150, ``sort_ways`` relation.rs:158-177,
``edgedistance`` relation.rs:92-105, ``dist_haversine`` relation.rs:180-196,
``join_ways`` relation.rs:203-227, ``flatten_ways`` relation.rs:229-254,
``close_linestring`` relation.rs:258-270, ``Relation::flatten_ways``
relation.rs:277-303) — written from scratch against that behavioural
contract, NOT translated line-by-line.

A "node" here is a ``(id, lat, lon)`` tuple; a "way" is a list of nodes.
Node equality is **by id only** (relation.rs:26-31): ``first_pass`` chains
on shared endpoint *ids*, while ``join_ways``/``close_linestring`` bridge
on *haversine distance* between endpoint coordinates. Both notions
coexist deliberately.

Preserved behavioural quirks (verified against the reference, see
SURVEY.md §2.1):

* ``edgedistance`` folds with a ``-1.0`` seed and ``min``, so it always
  returns ``-1.0`` (relation.rs:97-104). Consequently ``sort_ways`` is
  the identity permutation, status 101 really means "a second
  first_pass sweep merged it", and status 103 is unreachable dead code.
* ``first_pass`` drops the duplicated junction node when appending
  (``way[1:]``); ``join_ways`` keeps BOTH junction nodes (no dedup).
* ``join_ways`` uses strict ``< tolerance``; ``close_linestring`` uses
  ``<= tolerance``.
* closed mode: a 501 ring poisons the overall status; otherwise the
  LAST ring's status wins (relation.rs:291-296), and broken rings are
  still emitted as empty rings.

One documented divergence: the reference panics on a hydrated way with
zero nodes (``way[way.len()-1]`` on an empty vec, relation.rs:121);
callers here must drop empty ways before stitching (the Spark hydration
layer filters ``size(node_ids) > 0``).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

Node = Tuple[int, float, float]  # (id, lat, lon)
WayNodes = List[Node]

STATUS_OK = (0, "")
STATUS_SORTED = (101, "Sorted")
STATUS_JOINED = (102, "Joined")
STATUS_JOINED_SORTED = (103, "Joined Sorted")
STATUS_BROKEN = (501, "Broken")

EARTH_RADIUS_M = 6_371_000.0


def _same_way_by_id(a: Sequence[Node], b: Sequence[Node]) -> bool:
    """Vec<Node> equality under id-only Node equality (relation.rs:26-31)."""
    return len(a) == len(b) and all(x[0] == y[0] for x, y in zip(a, b))


def point_distance(p1: Node, p2: Node) -> float:
    """Euclidean distance in degrees (relation.rs:88-90)."""
    return math.hypot(p1[1] - p2[1], p1[2] - p2[2])


def edge_distance(w1: Sequence[Node], w2: Sequence[Node]) -> float:
    """Min distance over the 4 endpoint pairings (relation.rs:92-105).

    Faithful quirk: the reference seeds its min-fold with ``-1.0``,
    which is smaller than every real distance, so the result is always
    ``-1.0``. Preserved because ``sort_ways``' identity behaviour (and
    therefore the meaning of status 101/103) depends on it.
    """
    dists = (
        point_distance(w1[0], w2[0]),
        point_distance(w1[-1], w2[-1]),
        point_distance(w1[0], w2[-1]),
        point_distance(w1[-1], w2[0]),
    )
    acc = -1.0
    for d in dists:
        if not acc < d:
            acc = d
    return acc


def haversine_m(p1: Node, p2: Node) -> float:
    """Great-circle distance in meters, R=6,371,000 (relation.rs:180-196)."""
    lat1, lon1 = math.radians(p1[1]), math.radians(p1[2])
    lat2, lon2 = math.radians(p2[1]), math.radians(p2[2])
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = (
        math.sin(dlat / 2.0) ** 2
        + math.cos(lat1) * math.cos(lat2) * math.sin(dlon / 2.0) ** 2
    )
    return EARTH_RADIUS_M * 2.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))


def first_pass(ways: Sequence[WayNodes]) -> List[WayNodes]:
    """Greedy adjacent chain merge by shared endpoint ids (relation.rs:111-150).

    Single forward scan. If the current run is still exactly the
    previous input way (nothing merged into it yet) and the next way
    touches the run's FIRST node, the run is reversed first. Then the
    next way is appended forward (run.last == way.first) or reversed
    (run.last == way.last), dropping the duplicated junction node;
    otherwise it starts a new run.
    """
    out: List[WayNodes] = [list(ways[0])]
    for i in range(1, len(ways)):
        way = list(ways[i])
        prev = out[-1]
        if _same_way_by_id(prev, ways[i - 1]) and (
            way[0][0] == prev[0][0] or way[-1][0] == prev[0][0]
        ):
            out[-1] = prev[::-1]
            prev = out[-1]
        if prev[-1][0] == way[0][0]:
            out[-1] = prev + way[1:]
        elif prev[-1][0] == way[-1][0]:
            out[-1] = prev + way[::-1][1:]
        else:
            out.append(way)
    return out


def sort_ways(ways: Sequence[WayNodes]) -> List[WayNodes]:
    """Greedy nearest-first reordering (relation.rs:158-177).

    Because :func:`edge_distance` always returns ``-1.0``, the strict
    ``<`` comparison only fires for the first candidate of each round,
    so this is the IDENTITY permutation. Kept as an explicit loop so
    the contract (and the unit test asserting identity) documents the
    reference quirk rather than silently skipping the stage.
    """
    remaining = [list(w) for w in ways]
    out = [remaining.pop(0)]
    while remaining:
        min_dist = math.inf
        min_idx = 0
        for i, cand in enumerate(remaining):
            d = edge_distance(cand, out[-1])
            if d < min_dist:
                min_dist = d
                min_idx = i
        out.append(remaining.pop(min_idx))
    return out


def join_ways(ways: Sequence[WayNodes], tolerance_m: float) -> List[WayNodes]:
    """Gap bridging by endpoint haversine distance (relation.rs:203-227).

    Forward scan; bridges if any of 4 endpoint pairings is strictly
    closer than ``tolerance_m``, trying them in the reference's order
    (last-first, last-last, first-first, first-last); the 3rd/4th
    pairings reverse the accumulated run in place. Junction nodes are
    kept on BOTH sides (no dedup — unlike :func:`first_pass`).
    """
    joined: List[WayNodes] = [list(ways[0])]
    for w in ways[1:]:
        w = list(w)
        run = joined[-1]
        if haversine_m(run[-1], w[0]) < tolerance_m:
            joined[-1] = run + w
        elif haversine_m(run[-1], w[-1]) < tolerance_m:
            joined[-1] = run + w[::-1]
        elif haversine_m(run[0], w[0]) < tolerance_m:
            joined[-1] = run[::-1] + w
        elif haversine_m(run[0], w[-1]) < tolerance_m:
            joined[-1] = run[::-1] + w[::-1]
        else:
            joined.append(w)
    return joined


def flatten_ways(
    ways: Sequence[WayNodes], tolerance_m: float
) -> Tuple[List[WayNodes], Tuple[int, str]]:
    """Repair cascade with status codes (relation.rs:229-254).

    empty input -> 501 Broken; ``first_pass`` to 1 run -> 0 OK; a second
    ``first_pass`` over the (identity-)sorted runs to 1 -> 101 Sorted;
    ``join_ways`` over the first-pass runs to 1 -> 102 Joined;
    ``join_ways`` over the sorted runs -> 103 (unreachable: sorted ==
    passed, so it can never newly succeed); else empty geometry + 501.
    """
    if not ways:
        return [], STATUS_BROKEN
    passed = first_pass(ways)
    if len(passed) == 1:
        return passed, STATUS_OK
    sorted_ = sort_ways(passed)
    sorted_passed = first_pass(sorted_)
    if len(sorted_passed) == 1:
        return sorted_passed, STATUS_SORTED
    joined = join_ways(passed, tolerance_m)
    if len(joined) == 1:
        return joined, STATUS_JOINED
    joined_sorted = join_ways(sorted_, tolerance_m)
    if len(joined_sorted) == 1:  # pragma: no cover - dead per reference quirk
        return joined_sorted, STATUS_JOINED_SORTED
    return [], STATUS_BROKEN


def close_linestring(
    way: WayNodes, tolerance_m: float
) -> Tuple[WayNodes, Tuple[int, str]]:
    """Ring closure (relation.rs:258-270).

    Already closed (first id == last id) -> unchanged, status 0.
    Endpoints within ``<= tolerance_m`` -> append a copy of the first
    node, status 102. Otherwise the ring is emitted EMPTY with 501.
    """
    if way[0][0] == way[-1][0]:
        return list(way), STATUS_OK
    if haversine_m(way[0], way[-1]) <= tolerance_m:
        return list(way) + [way[0]], STATUS_JOINED
    return [], STATUS_BROKEN


def flatten(
    ways: Sequence[WayNodes], tolerance_m: float, closed: bool
) -> Tuple[List[WayNodes], Tuple[int, str]]:
    """Public entry point (relation.rs:277-303 / 310-336).

    Route mode (``closed=False``): the cascade result as-is.
    Area mode (``closed=True``): each run is closed; any 501 ring
    poisons the overall status to 501, otherwise the LAST ring's
    status overwrites the accumulated one (reference quirk).
    """
    f_ways, f_status = flatten_ways(ways, tolerance_m)
    if closed and f_status[0] != 501:
        out: List[WayNodes] = []
        status = f_status
        for w in f_ways:
            w_closed, w_status = close_linestring(w, tolerance_m)
            if w_status[0] == 501:
                status = STATUS_BROKEN
            if w_status[0] != 501 and status[0] != 501:
                status = w_status
            out.append(w_closed)
        return out, status
    return f_ways, f_status
