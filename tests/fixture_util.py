"""Shared access to the decoded reference fixture entities.

``testpbf_entities.json`` is the decoded content of the reference's
``tests/test.pbf`` (data, not code): 563 nodes, 126 ways, 2 PT route
relations (85965, 2030162). Produced by
``osmptparser_spark.sources.pbf.read_pbf`` and pinned here so tests do
not depend on the reference checkout being present.
"""

import json
import os

FIXTURE_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "testpbf_entities.json")
REFERENCE_PBF = "/root/reference/tests/test.pbf"


def load_entities():
    with open(FIXTURE_PATH) as f:
        data = json.load(f)
    # normalize: member triples back to tuples
    for r in data["relations"]:
        r["members"] = [tuple(m) for m in r["members"]]
    return data


def hydrate_relation(data, rel):
    """Driver-side hydration mirroring mod.rs:664-702: keep member order,
    drop dangling way/node refs, split members role-blind."""
    nodes = {n["id"]: n for n in data["nodes"]}
    ways = {w["id"]: w for w in data["ways"]}
    hyd = []
    for m in rel["members"]:
        if m[2] != "way" or m[1] not in ways:
            continue
        nds = [
            (nid, nodes[nid]["lat"], nodes[nid]["lon"])
            for nid in ways[m[1]]["refs"]
            if nid in nodes
        ]
        if nds:  # empty hydrated ways dropped pre-stitch (SURVEY §2.1 quirk 7)
            hyd.append(nds)
    stops = [m[1] for m in rel["members"] if m[2] == "node" and m[1] in nodes]
    return hyd, stops
