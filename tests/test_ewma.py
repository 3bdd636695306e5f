"""The EWMA recurrence must match a hand-rolled reference fold exactly
(same float op order), proving the Arrow path computes y_t = a*x_t +
(1-a)*y_{t-1} over (ts, event_id)-ordered rows per user."""

from __future__ import annotations

from etl_earthquake_gcp_spark.plans import QUERIES
from etl_earthquake_gcp_spark.sources.tables import load_table

from .conftest import SF_DIR

ALPHA = 0.2


def test_ewma_matches_recurrence(spark):
    out = {
        (r.user_id, r.event_id): r.ewma
        for r in QUERIES["ewma_user_values"].spark_fn(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events").collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    assert out and len(out) == len(ev)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        y = None
        for r in rows:
            y = r.value if y is None else ALPHA * r.value + (1 - ALPHA) * y
            assert abs(out[(uid, r.event_id)] - round(y, 4)) <= 1e-9, (
                uid,
                r.event_id,
            )
