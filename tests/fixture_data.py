"""Synthetic GeoJSON fixture for pipeline tests (FIXTURES.md §A).

Covers: duplicate ids with differing `updated` (dedup), out-of-range and
null values (validation), every magnitude CASE boundary (2.9..8.0), depth
boundaries (70/300), places with 0/1/2 commas and trailing whitespace
(regex extraction), tsunami 0/1, all lat/lon sign quadrants, and
non-earthquake event types (ML filter).
"""

from __future__ import annotations

import json

_BASE_TIME = 1700000000000  # 2023-11-14T22:13:20Z (epoch ms)
_DAY = 86_400_000


def _feature(
    fid: str,
    mag,
    place,
    time=_BASE_TIME,
    updated=None,
    tsunami=0,
    sig=100,
    felt=5,
    nst=20,
    rms=0.5,
    gap=45.0,
    ftype="earthquake",
    mag_type="ml",
    lon=-70.5,
    lat=-33.4,
    depth=10.0,
    alert="green",
):
    return {
        "id": fid,
        "properties": {
            "mag": mag,
            "place": place,
            "time": time,
            "updated": updated if updated is not None else time + 3_600_000,
            "url": f"https://example.org/{fid}",
            "felt": felt,
            "cdi": 2.5,
            "mmi": 3.0,
            "alert": alert,
            "status": "reviewed",
            "tsunami": tsunami,
            "sig": sig,
            "net": "us",
            "code": fid[-4:],
            "nst": nst,
            "dmin": 0.1,
            "rms": rms,
            "gap": gap,
            "magType": mag_type,
            "type": ftype,
            "title": f"M {mag} - {place}",
        },
        "geometry": {"coordinates": [lon, lat, depth]},
    }


FEATURES = [
    # --- dedup: same id, three revisions; updated=+3d must win (A5) -------
    _feature("ev_dup", 5.5, "30km N of Dupville, Chile", updated=_BASE_TIME + 1 * _DAY),
    _feature("ev_dup", 5.6, "30km N of Dupville, Chile", updated=_BASE_TIME + 3 * _DAY),
    _feature("ev_dup", 5.4, "30km N of Dupville, Chile", updated=_BASE_TIME + 2 * _DAY),
    # --- magnitude CASE boundaries (b2s.py:119-126) ------------------------
    _feature("ev_m29", 2.9, "A, Chile"),  # Micro (<3.0)
    _feature("ev_m30", 3.0, "B, Chile"),  # Minor (exactly 3.0)
    _feature("ev_m39", 3.9, "C, Chile"),  # Minor
    _feature("ev_m40", 4.0, "D, Chile"),  # Light
    _feature("ev_m50", 5.0, "E, Chile"),  # Moderate
    _feature("ev_m60", 6.0, "F, Chile"),  # Strong
    _feature("ev_m70", 7.0, "G, Chile", tsunami=1),  # Major
    _feature("ev_m80", 8.0, "H, Chile", tsunami=1),  # Great (exactly 8.0)
    # --- depth boundaries (b2s.py:127-130) --------------------------------
    _feature("ev_d70", 4.5, "I, Peru", depth=70.0),  # Shallow (≤70)
    _feature("ev_d701", 4.5, "J, Peru", depth=70.1),  # Intermediate
    _feature("ev_d300", 4.5, "K, Peru", depth=300.0),  # Intermediate (≤300)
    _feature("ev_d301", 4.5, "L, Peru", depth=300.5),  # Deep
    # --- validation rejects (P6, b2s.py:103-109) ---------------------------
    _feature("ev_badmag_hi", 10.5, "M, Chile"),  # mag > 10
    _feature("ev_badmag_lo", -2.5, "N, Chile"),  # mag < -2
    _feature("ev_badlat", 5.0, "O, Chile", lat=95.0),  # lat > 90
    _feature("ev_badlon", 5.0, "P, Chile", lon=-190.0),  # lon < -180
    _feature("ev_baddepth", 5.0, "Q, Chile", depth=1000.0),  # depth ≥ 1000
    _feature("ev_negdepth", 5.0, "R, Chile", depth=-1.0),  # depth < 0
    _feature("ev_nullmag", None, "S, Chile"),  # null magnitude
    # --- validation edge values that must PASS -----------------------------
    _feature("ev_mag_min", -2.0, "T, Chile"),  # mag == -2 allowed
    _feature("ev_mag_max", 10.0, "U, Chile", tsunami=1),  # mag == 10 allowed
    _feature("ev_lat_edge", 4.2, "V, Chile", lat=-90.0),
    _feature("ev_lon_edge", 4.2, "W, Chile", lon=180.0),
    _feature("ev_depth0", 4.2, "X, Chile", depth=0.0),
    # --- place regex cases (F5/F6, b2s.py:138-141) -------------------------
    _feature("ev_nocomma", 4.1, "Somewhere Remote"),  # no comma → country=place
    _feature("ev_onecomma", 4.1, "10km NE of Town, Bolivia"),
    _feature("ev_twocomma", 4.1, "5km S of Alpha, Beta Region, Japan"),
    _feature("ev_trailing", 4.1, "12km W of City, Peru  "),  # trailing blanks
    # --- hemisphere quadrants (b2s.py:131-132) -----------------------------
    _feature("ev_ne", 4.3, "NE Q, Japan", lat=35.0, lon=139.0),
    _feature("ev_nw", 4.3, "NW Q, USA", lat=37.0, lon=-122.0),
    _feature("ev_se", 4.3, "SE Q, Indonesia", lat=-6.0, lon=106.0),
    _feature("ev_sw", 4.3, "SW Q, Chile", lat=-33.0, lon=-70.0),
    _feature("ev_eq0", 4.3, "Origin, Ghana", lat=0.0, lon=0.0),  # ≥0 → N/E
    # --- non-earthquake types (ML filter P7, train.py:53) ------------------
    _feature("ev_quarry", 3.2, "Quarry, USA", ftype="quarry blast"),
    _feature("ev_expl", 2.0, "Mine, USA", ftype="explosion"),
    # --- time spread for dim_date range (different months) -----------------
    _feature("ev_t2", 5.1, "Y, Chile", time=_BASE_TIME + 40 * _DAY, tsunami=1),
    _feature("ev_t3", 5.2, "Z, Chile", time=_BASE_TIME + 75 * _DAY),
]

# ids that survive validation (everything except the 7 rejects), after dedup
EXPECTED_VALID_IDS = sorted(
    {
        f["id"]
        for f in FEATURES
        if not f["id"].startswith(("ev_bad", "ev_null", "ev_negdepth"))
    }
)


def feature_collection() -> dict:
    return {"type": "FeatureCollection", "features": FEATURES}


def write_geojson(path: str) -> str:
    """One-document blob (multiLine read, like the bronze ingest writes)."""
    with open(path, "w") as fh:
        json.dump(feature_collection(), fh)
    return path


def write_ndjson(path: str, chunk: int = 7) -> str:
    """NDJSON variant: several FeatureCollection docs, one per line."""
    with open(path, "w") as fh:
        for i in range(0, len(FEATURES), chunk):
            doc = {"type": "FeatureCollection", "features": FEATURES[i : i + chunk]}
            fh.write(json.dumps(doc) + "\n")
    return path
