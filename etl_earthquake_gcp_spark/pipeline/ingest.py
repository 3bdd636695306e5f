"""Ingest stage — fetch a GeoJSON FeatureCollection, write ONE raw blob.

This closes the S2 write side (SURVEY §2.1): the reference's Cloud Function
HTTP-GETs the USGS feed and uploads the raw dict as a single JSON object —
``bronze/raw_earthquakes.json`` (cloud_function/main.py:61-89). Bronze is
deliberately NOT a distributed write: it is one edge-sized document per
fetch, so a plain single-object write (the local analog of
``blob.upload_from_string``) is the correct tool — Spark parallelism starts
at bronze→silver, where ``read_geojson`` fans the document's features out
across partitions.

The transport is a seam (like sources/usgs_source.py): callers pass any
zero-arg callable returning the decoded GeoJSON dict. ``http_fetch`` builds
the reference's exact query (main.py:64-71) on stdlib urllib for connected
deploys; tests stub the callable with a fixture document.
"""

from __future__ import annotations

import json
import logging
import os
from collections.abc import Callable

USGS_API_BASE_URL = "https://earthquake.usgs.gov/fdsnws/event/1/query"

logger = logging.getLogger(__name__)


def http_fetch(
    base_url: str = USGS_API_BASE_URL,
    days: int = 365,
    min_magnitude: float = 2.5,
    limit: int = 20000,
    timeout: int = 120,
) -> dict:
    """The reference's fetch (main.py:61-77): last ``days`` of events at
    ``min_magnitude``+, GeoJSON format, capped at the API's ``limit``."""
    from datetime import datetime, timedelta, timezone
    from urllib.parse import urlencode
    from urllib.request import urlopen

    end = datetime.now(timezone.utc)
    start = end - timedelta(days=days)
    params = urlencode(
        {
            "format": "geojson",
            "starttime": start.strftime("%Y-%m-%dT%H:%M:%S"),
            "endtime": end.strftime("%Y-%m-%dT%H:%M:%S"),
            "minmagnitude": min_magnitude,
            "limit": limit,
        }
    )
    with urlopen(f"{base_url}?{params}", timeout=timeout) as resp:
        return json.load(resp)


def write_bronze_blob(doc: dict, bronze_path: str) -> int:
    """Write the raw GeoJSON dict as ONE JSON object at ``bronze_path``
    (main.py:83-89's ``upload_from_string(json.dumps(...))``); returns the
    feature count. Overwrite keeps the stage idempotent like every other
    layer write."""
    parent = os.path.dirname(bronze_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(bronze_path, "w") as fh:
        json.dump(doc, fh)
    return len(doc.get("features", []))


def ingest_to_bronze(fetch: Callable[[], dict], bronze_path: str) -> int:
    """task-1 analog (fetch_and_store_usgs_data): fetch → raw blob."""
    doc = fetch()
    n = write_bronze_blob(doc, bronze_path)
    logger.info("ingested %d features to %s", n, bronze_path)
    return n
