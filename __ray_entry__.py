"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``  — flagship near-dup pipeline on sf0.001-derived transcripts.
- ``queries()`` — one callable per implemented operator/pipeline (SURVEY §2 +
  the training-data extras); each takes ``sf_dir`` and returns a Dataset /
  DataFrame / Table.
- ``oracle_sql()`` — DuckDB-runnable SQL equivalents over the pre-registered
  views.  Column names match the Ray outputs exactly.  Queries without an
  entry here are non-SQL-expressible (LSH internals, heuristics, approximate
  search, the transcript pipeline whose input the engine synthesizes) and get
  the driver's rows-only check; their semantics are pinned by the NumPy
  oracle in ``near_duplicate_detection_ray/oracle.py`` and pytest.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: derive transcripts from sf0.001 documents (row-local,
    deterministic dup planting), run the full near-dup pipeline, return the
    clusters table."""
    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline
    from near_duplicate_detection_ray.sources.transcripts import (
        transcripts_from_documents,
    )

    transcripts = transcripts_from_documents("/root/testdata/sf0.001")
    result = near_dup_pipeline(transcripts, include_substring=True)
    return result["clusters"]


# ---------------------------------------------------------------------------


def _ndd_clusters(sf_dir: str):
    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline
    from near_duplicate_detection_ray.sources.transcripts import (
        transcripts_from_documents,
    )

    return near_dup_pipeline(transcripts_from_documents(sf_dir))["clusters"]


def _ndd_dup_pairs(sf_dir: str):
    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline
    from near_duplicate_detection_ray.sources.transcripts import (
        transcripts_from_documents,
    )

    res = near_dup_pipeline(transcripts_from_documents(sf_dir), include_substring=False)
    return res["dup_pairs"].select_columns(["a", "b", "jaccard", "method"])


def _assemble_transcripts(sf_dir: str):
    from near_duplicate_detection_ray.sources.transcripts import (
        transcripts_from_documents,
    )
    from near_duplicate_detection_ray.stages.assemble import assemble_conversations

    return assemble_conversations(transcripts_from_documents(sf_dir))


def queries() -> dict[str, Callable[[str], Any]]:
    from near_duplicate_detection_ray.pipelines import (
        ann,
        docs_dedup,
        multimodal,
        relational,
        text_analysis,
    )

    return {
        # --- relational operator parity (SQL-checked) ---
        "pricing_summary": relational.pricing_summary,
        "top_orders": relational.top_orders,
        "order_priority_counts": relational.order_priority_counts,
        "nation_revenue": relational.nation_revenue,
        "shipped_within_90d": relational.shipped_within_90d,
        "grouped_topk_events": relational.grouped_topk_events,
        "distinct_event_types": relational.distinct_event_types,
        "events_hourly": relational.events_hourly,
        "supplier_balance_by_nation": relational.supplier_balance_by_nation,
        "user_sessions": relational.user_sessions,
        # --- text analysis (SQL-checked where expressible) ---
        "token_counts_docs": text_analysis.token_counts,
        "quality_docs": text_analysis.quality_scores,
        "length_class_docs": text_analysis.length_class,
        "validate_docs": text_analysis.validate_docs,
        "lang_id_docs": text_analysis.lang_id_docs,            # rows-only
        "doc_fingerprints": text_analysis.doc_fingerprints,    # rows-only (winnowing)
        "english_long_docs": text_analysis.english_long_docs,  # SQL-checked (pushdown)
        # --- dedup family over documents ---
        "exact_dedup_docs": docs_dedup.exact_dedup_docs,       # SQL-checked
        "near_dup_pairs_docs": docs_dedup.near_dup_pairs_docs,  # SQL-checked (brute-force oracle)
        "simhash_pairs_docs": docs_dedup.simhash_pairs_docs,    # rows-only
        # --- similarity search over embeddings ---
        "ann_cosine_topk": ann.cosine_topk,                    # SQL-checked
        "ann_lsh_topk": ann.ann_lsh_topk,                      # rows-only (approximate)
        "embedding_dup_pairs": ann.embedding_dup_pairs,        # SQL-checked
        # --- multimodal binary-column plumbing (stubbed decode; rows-only) ---
        "media_feature_summary": multimodal.media_feature_summary,
        # --- flagship transcript pipeline (engine-synthesized input; rows-only,
        #     pinned by the NumPy oracle in pytest) ---
        "ndd_clusters": _ndd_clusters,
        "ndd_dup_pairs": _ndd_dup_pairs,
        "ndd_conversations": _assemble_transcripts,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4)                         AS sum_qty,
                   round(sum(l_extendedprice), 4)                    AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(avg(l_quantity), 4)                         AS avg_qty,
                   round(avg(l_discount), 4)                         AS avg_disc,
                   count(*)                                          AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "order_priority_counts": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY o_orderpriority
        """,
        "nation_revenue": """
            SELECT n_name, round(sum(o_totalprice), 4) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "shipped_within_90d": """
            SELECT o_orderstatus, count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= o_orderdate
              AND l_shipdate <  o_orderdate + INTERVAL 90 DAY
            GROUP BY o_orderstatus
        """,
        "grouped_topk_events": """
            WITH best AS (
                SELECT event_id, user_id, event_type, value,
                       row_number() OVER (
                           PARTITION BY user_id
                           ORDER BY value DESC, event_id ASC
                       ) AS rn
                FROM events
            )
            SELECT event_id, user_id, event_type, value
            FROM best WHERE rn = 1
            ORDER BY value DESC, event_id ASC
            LIMIT 5
        """,
        "distinct_event_types": """
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        """,
        "user_sessions": """
            WITH g AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id,
                   CAST(sum(new_session) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY user_id
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "supplier_balance_by_nation": """
            SELECT n_name,
                   round(sum(s_acctbal), 4) AS total_bal,
                   min(s_acctbal)           AS min_bal,
                   max(s_acctbal)           AS max_bal,
                   count(*)                 AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "token_counts_docs": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "quality_docs": """
            SELECT doc_id,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE (length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g'))) * 1.0 / length(text)
                   END AS punct_ratio,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0 / length(text)
                   END AS digit_ratio,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) * 1.0 / length(text)
                   END AS alpha_ratio,
                   CASE WHEN trim(text) = '' THEN 0.0
                        ELSE (
                            SELECT count(*) FILTER (
                                WHERE trim(lower(tok), '.,!?;:"''()') IN
                                    ('the','and','of','to','a','in','is','it','you','that',
                                     'was','for','on','are','with','as','his','they','at')
                            ) * 1.0 / count(*)
                            FROM UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS t(tok)
                        )
                   END AS stopword_ratio,
                   length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "length_class_docs": """
            SELECT doc_id,
                   CASE WHEN n_chars <= 175 THEN 'short'
                        WHEN n_chars <= 325 THEN 'medium'
                        ELSE 'long' END AS length_class
            FROM documents
        """,
        "validate_docs": """
            SELECT count(*) AS n_rows,
                   count(*) FILTER (WHERE trim(text) = '') AS n_blank_text,
                   count(*) FILTER (WHERE length(text) <> n_chars) AS n_chars_mismatch
            FROM documents
        """,
        "exact_dedup_docs": """
            SELECT md5(text) AS fingerprint,
                   min(doc_id) AS rep_id,
                   count(*) AS n_members
            FROM documents
            GROUP BY md5(text)
        """,
        "near_dup_pairs_docs": """
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), '\\s+'
                       ) AS t
                FROM documents
                WHERE trim(text) <> ''
            ), sh AS (
                SELECT DISTINCT doc_id, s
                FROM toks, UNNEST(
                    CASE WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                         ELSE [array_to_string(t[i:i+4], ' ') for i in range(1, len(t) - 3)]
                    END
                ) AS u(s)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT a, b,
                   round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON inter.a = sa.doc_id
            JOIN sizes sb ON inter.b = sb.doc_id
            WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.8
        """,
        "embedding_dup_pairs": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]),
                      CAST(b.embedding AS DOUBLE[])
                  ) >= 0.4
        """,
        "english_long_docs": """
            SELECT doc_id, lang, n_chars, source
            FROM documents
            WHERE lang = 'en' AND n_chars > 300
        """,
        "ann_cosine_topk": """
            WITH sims AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(c.embedding AS DOUBLE[])
                       ) AS score
                FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 10
            ), ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY score DESC, neighbor_id ASC
                       ) AS rank
                FROM sims
            )
            SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
        """,
    }
