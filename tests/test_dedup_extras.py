"""Planted-case tests for the round-2 dedup additions: prefix-blocked
Levenshtein pairs and cross-corpus n-gram decontamination (the sf0.01 gate
data happens to contain no contamination hits, so the drop path is proven
here with a hand-built corpus)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from near_duplicate_detection_ray.functions.hashing import md5_low64


def _ids_by_split(n_eval: int, n_train: int, pct: int = 10):
    """Scan small ints for ids landing in the eval / train hash split."""
    ev, tr, i = [], [], 0
    while len(ev) < n_eval or len(tr) < n_train:
        (ev if md5_low64(str(i)) % 100 < pct else tr).append(i)
        i += 1
    return ev[:n_eval], tr[:n_train]


def _write_docs(d: str, rows: list[tuple[int, str]]):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["t"] * len(rows), pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )


def test_decontaminate_drops_exactly_the_gram_sharers(ray_session, tmp_path_factory):
    from near_duplicate_detection_ray.pipelines.curate import decontaminate_docs

    (eval_id,), train_ids = _ids_by_split(1, 4)
    secret = " ".join(f"s{i}" for i in range(8))  # the shared 8-gram
    rows = [
        (eval_id, "alpha beta " + secret + " gamma delta"),
        # contaminated: contains the eval 8-gram verbatim
        (train_ids[0], "intro words here " + secret + " trailing tail"),
        # clean: shares 7 of the 8 words contiguously, not all 8
        (train_ids[1], " ".join(f"s{i}" for i in range(7)) + " other words padding"),
        # clean: unrelated
        (train_ids[2], "completely different content with many words " * 2),
        # clean but SHORT (< 8 tokens -> no grams at all)
        (train_ids[3], "tiny doc only"),
    ]
    d = str(tmp_path_factory.mktemp("decon"))
    _write_docs(d, rows)
    got = sorted(decontaminate_docs(d).to_pandas()["doc_id"])
    assert got == sorted(train_ids[1:])  # train_ids[0] dropped, eval excluded


def test_edit_distance_pairs_planted(ray_session, tmp_path_factory):
    from near_duplicate_detection_ray.pipelines.docs_dedup import edit_distance_pairs

    pfx = "x" * 40  # shared blocking prefix
    base = pfx + " the quick brown fox jumps over the lazy dog again"
    rows = [
        (0, base),
        (1, base.replace("quick", "quack")),        # dist 1-2, same block
        (2, pfx + " entirely different continuation goes here"),  # same block, far
        (3, "y" * 40 + base[40:]),                  # different prefix -> never paired
    ]
    d = str(tmp_path_factory.mktemp("editdist"))
    _write_docs(d, rows)
    df = edit_distance_pairs(d).to_pandas()
    pairs = {(a, b): dist for a, b, dist in df.itertuples(index=False)}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 2
    assert all(3 not in p for p in pairs)
    # the far doc exceeds max_dist against both
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_edit_distance_matches_oracle_sf0001(ray_session):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.docs_dedup import edit_distance_pairs

    got = (
        edit_distance_pairs("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["edit_distance_pairs"])
        .df()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedup_best_docs_quality_rule(ray_session, tmp_path_factory):
    """The LONGEST member wins its component (tie -> min id), which must
    differ from dedup_keep_docs' min-id rule on this corpus."""
    from near_duplicate_detection_ray.pipelines.docs_dedup import dedup_best_docs

    d = str(tmp_path_factory.mktemp("bestdocs"))
    base = " ".join(f"w{i}" for i in range(40))  # distinct tokens -> dense shingles
    rows = [
        (0, base),                                   # near-dup cluster {0,1}
        (1, base + " iota kappa"),                   # longer -> should win (j=36/38)
        (2, "totally different text about unrelated matters entirely here"),
        (3, "x"),                                    # singleton short doc
        (4, base + " iota kappa"),                   # exact copy of 1 (tie -> min id 1)
    ]
    _write_docs(d, rows)
    got = dedup_best_docs(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    kept = dict(zip(got["doc_id"], got["n_members"]))
    assert kept == {1: 3, 2: 1, 3: 1}  # 1 beats 0 on length and 4 on id
    assert set(got["n_chars"]) == {len(rows[1][1]), len(rows[2][1]), 1}


def test_dedup_best_docs_matches_oracle_sf0001(ray_session):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.docs_dedup import dedup_best_docs

    got = (
        dedup_best_docs("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["dedup_best_docs"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dup_spans_planted(ray_session, tmp_path_factory):
    """Cross-doc shared run, within-doc repeat, and non-duplicated filler:
    spans cover exactly the duplicated 8-gram runs, merged per doc."""
    from near_duplicate_detection_ray.pipelines.docs_dedup import dup_spans_docs

    d = str(tmp_path_factory.mktemp("spans"))
    shared = " ".join(f"s{i}" for i in range(12))  # 12-token shared run
    rows = [
        (0, " ".join(f"a{i}" for i in range(5)) + " " + shared
             + " " + " ".join(f"b{i}" for i in range(5))),  # shared at tok 6..17
        (1, shared + " " + " ".join(f"c{i}" for i in range(10))),  # shared at 1..12
        (2, " ".join(f"d{i}" for i in range(30))),  # unique -> no spans
        (3, " ".join(f"e{i}" for i in range(8)) + " x y z "
             + " ".join(f"e{i}" for i in range(8))),  # within-doc repeated 8-gram
    ]
    _write_docs(d, rows)
    got = (
        dup_spans_docs(d)
        .to_pandas()
        .sort_values(["doc_id", "start_tok"])
        .reset_index(drop=True)
    )
    spans = {
        (r.doc_id, r.start_tok, r.end_tok, r.n_tokens) for r in got.itertuples()
    }
    # doc 0: grams at token starts 6..10 are duplicated -> span 6..17 (12 toks)
    # doc 1: starts 1..5 -> span 1..12
    # doc 3: 'e0..e7' appears at 1..8 and 12..19 -> two 8-token spans
    assert spans == {
        (0, 6, 17, 12),
        (1, 1, 12, 12),
        (3, 1, 8, 8),
        (3, 12, 19, 8),
    }
    assert 2 not in set(got["doc_id"])


def test_dup_spans_matches_oracle_sf0001(ray_session):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.docs_dedup import dup_spans_docs

    got = (
        dup_spans_docs("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["doc_id", "start_tok"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["dup_spans_docs"])
        .df()
        .sort_values(["doc_id", "start_tok"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_cut_spans_planted(ray_session, tmp_path_factory):
    """Span cutting removes exactly the covered tokens and preserves order,
    including blank docs, fully-duplicated docs, and untouched docs."""
    from near_duplicate_detection_ray.pipelines.docs_dedup import cut_spans_docs

    d = str(tmp_path_factory.mktemp("cut"))
    shared = " ".join(f"s{i}" for i in range(10))
    rows = [
        (0, "head0 head1 " + shared + " tail0 tail1"),
        (1, shared),                                  # fully duplicated -> ''
        (2, " ".join(f"u{i}" for i in range(20))),    # untouched
        (3, ""),                                      # blank
    ]
    _write_docs(d, rows)
    got = (
        cut_spans_docs(d)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.loc[0, "kept_text"] == "head0 head1 tail0 tail1"
    assert got.loc[0, "n_removed"] == 10
    assert got.loc[1, "kept_text"] == "" and got.loc[1, "n_removed"] == 10
    assert got.loc[2, "kept_text"] == rows[2][1] and got.loc[2, "n_removed"] == 0
    assert got.loc[3, "kept_text"] == "" and got.loc[3, "n_removed"] == 0


def test_cut_spans_matches_oracle_sf0001(ray_session):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.docs_dedup import cut_spans_docs

    got = (
        cut_spans_docs("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["cut_spans_docs"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_removed"] > 0).any()


def test_prepare_training_docs_matches_oracle_sf0001(ray_session):
    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.curate import prepare_training_docs

    got = (
        prepare_training_docs("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["prepare_training_docs"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    assert (got["n_tokens"] >= 10).all()


def test_dedup_report_consistency(ray_session):
    """dedup_report_docs internal identities: n_dropped = n_docs -
    n_components, dup_rate matches, chars_dropped equals the sum of n_chars
    over non-representative members computed independently."""
    import duckdb

    from near_duplicate_detection_ray.pipelines.docs_dedup import (
        dedup_keep_docs,
        dedup_report_docs,
    )

    sf = "/root/testdata/sf0.001"
    rep = dedup_report_docs(sf).to_pandas().iloc[0]
    assert rep["n_dropped"] == rep["n_docs"] - rep["n_components"]
    assert abs(rep["dup_rate"] - (1 - rep["n_components"] / rep["n_docs"])) < 1e-6

    keep = dedup_keep_docs(sf).to_pandas()
    assert len(keep) == rep["n_components"]
    assert int(keep["n_members"].sum()) == int(rep["n_docs"])

    con = duckdb.connect()
    total = con.sql(
        f"SELECT CAST(sum(n_chars) AS BIGINT) FROM '{sf}/documents.parquet'"
    ).fetchone()[0]
    kept_ids = ",".join(str(i) for i in keep["doc_id"])
    kept_chars = con.sql(
        f"SELECT CAST(sum(n_chars) AS BIGINT) FROM '{sf}/documents.parquet' "
        f"WHERE doc_id IN ({kept_ids})"
    ).fetchone()[0]
    assert rep["chars_dropped"] == total - kept_chars
