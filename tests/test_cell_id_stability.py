"""Pinned cell-id goldens: H3X/S2X ids are PERSISTED in tiles tables, so
encoders must stay bit-stable across refactors. These values were
produced by the current implementation (there is no h3/s2 wheel in the
sandbox to cross-check against; stability, hierarchy and round-trip are
the contract)."""

import numpy as np

from osmptparser_spark.functions import h3x, s2x

# (lat, lon): Quito fixture bbox, Guayaquil, Paris, Sydney, near-pole
COORDS = [
    (-0.22, -78.51),
    (-2.1894, -79.8891),
    (48.8566, 2.3522),
    (-33.8688, 151.2093),
    (81.0, 30.0),
]


def test_h3x_pinned_ids():
    lat = np.array([c[0] for c in COORDS])
    lon = np.array([c[1] for c in COORDS])
    got = {res: h3x.latlng_to_cell(lat, lon, res).tolist() for res in (7, 9)}
    assert got[7] == [
        1430167026449514495,
        1430165684121239551,
        1405723475221413887,
        1418319805789765631,
        1406287919202697215,
    ]
    assert got[9] == [
        1502224620478529535,
        1502223278153138175,
        1477781069245972479,
        1490377399813275647,
        1478345513225420799,
    ]


def test_s2x_pinned_ids():
    lat = np.array([c[0] for c in COORDS])
    lon = np.array([c[1] for c in COORDS])
    got = s2x.cell_id(lat, lon, 16).tolist()
    assert got == [
        -7938269959044464640,
        -8057662704405446656,
        5180949494585360384,
        7715420701271785472,
        5004206119103496192,
    ]
