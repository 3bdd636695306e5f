"""Oracle-SQL snippets shared across query modules.

Lives in its own registration-free module so that cross-module imports
(e.g. ``analytics_queries`` ← ``text_queries``) never change the driver's
registration ORDER — `plans/__init__.py` sequences module imports so the
not-yet-driver-verified queries register first.
"""

from __future__ import annotations


# the ≥0.8 Jaccard pair graph as a reusable oracle CTE body (edges +
# symmetric closure), shared by the component / clean-corpus oracles
def _pairs_cte(doc_filter: str = "TRUE") -> str:
    return f"""
        cand AS (
            SELECT doc_id, text, lang, source, n_chars
            FROM documents WHERE {doc_filter}
        ), tok AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
            FROM cand
        ), sizes AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY doc_id
        ), common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_common
            FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), pairs AS (
            SELECT c.doc_a, c.doc_b
            FROM common c
            JOIN sizes sa ON c.doc_a = sa.doc_id
            JOIN sizes sb ON c.doc_b = sb.doc_id
            WHERE c.n_common * 1.0 / (sa.n + sb.n - c.n_common) >= 0.8
        ), edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ), reach(id, r) AS (
            SELECT doc_id, doc_id FROM cand
            UNION
            SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
        ), components AS (
            SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component
            FROM reach GROUP BY id
        )
    """
