"""Bloom-screened decontamination pins: output identical to the exact path,
including under a deliberately terrible false-positive rate (the confirm join
must drop every FP), and the empty-eval edge."""

import sys

import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _ids(ds):
    return sorted(ds.to_pandas()["doc_id"].tolist())


def test_bloom_path_equals_exact(ray_session):
    from near_duplicate_detection_ray.pipelines.curate import (
        decontaminate_docs,
        decontaminate_docs_bloom,
    )

    exact = _ids(decontaminate_docs(SF))
    bloom = _ids(decontaminate_docs_bloom(SF))
    assert bloom == exact and len(exact) > 0


def test_bloom_path_survives_high_fp_rate(ray_session):
    """fp_rate=0.5 floods the candidate stream with false positives; the
    exact confirm join must still produce the identical survivor set."""
    from near_duplicate_detection_ray.pipelines.curate import (
        decontaminate_docs,
        decontaminate_docs_bloom,
    )

    exact = _ids(decontaminate_docs(SF))
    noisy = _ids(decontaminate_docs_bloom(SF, fp_rate=0.5))
    assert noisy == exact


def test_bloom_path_empty_eval_split(ray_session):
    """pct=0 puts nothing in the eval split: no grams, no bloom, every doc
    survives."""
    import pyarrow.parquet as pq

    from near_duplicate_detection_ray.pipelines.curate import (
        decontaminate_docs_bloom,
    )

    out = _ids(decontaminate_docs_bloom(SF, pct=0))
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert len(out) == n_docs


def test_fuzzy_decontaminate_matches_oracle_sf0001(ray_session):
    import duckdb

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.curate import (
        decontaminate_docs_fuzzy,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["decontaminate_docs_fuzzy"]).df()
    got = decontaminate_docs_fuzzy(sf).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fuzzy_decontaminate_planted_leak(ray_session, tmp_path):
    """A train doc that is a near-copy of an eval doc must be dropped; an
    unrelated train doc survives.  Eval membership = md5_low64(id) % 100 < 10,
    so pick ids by their actual hash buckets."""
    import pyarrow.parquet as pq

    from near_duplicate_detection_ray.functions.hashing import md5_low64
    from near_duplicate_detection_ray.pipelines.curate import (
        decontaminate_docs_fuzzy,
    )

    eval_ids = [i for i in range(3000) if md5_low64(str(i)) % 100 < 10]
    train_ids = [i for i in range(3000) if md5_low64(str(i)) % 100 >= 10]
    # 100 distinct tokens -> 96 distinct 5-shingles; one mid-token edit
    # corrupts 5 of them: jaccard = 91/101 ~ 0.90 >= 0.8
    base = " ".join(f"w{i}" for i in range(100))
    near = base.replace("w50 ", "zzz ")
    other = "completely different words " * 10
    rows = [
        (eval_ids[0], base),      # eval anchor
        (train_ids[0], near),     # leaked train doc -> dropped
        (train_ids[1], other),    # clean train doc -> kept
        (eval_ids[1], other),     # identical eval twin -> train copy dropped too
        (train_ids[2], "tiny"),   # short clean doc -> kept
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = decontaminate_docs_fuzzy(str(tmp_path)).to_pandas()
    # train_ids[0] leaked vs eval base; train_ids[1] is an exact copy of an
    # eval doc (jaccard 1.0) -> dropped; only the short clean doc survives
    assert sorted(got["doc_id"]) == [train_ids[2]]


def test_upsert_docs_semantics(ray_session):
    """Every base id appears exactly once; updated-bucket ids carry version 1
    with the +8-char body; inserted ids are -(id+1) for the <5 bucket."""
    import duckdb

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.functions.hashing import md5_low64
    from near_duplicate_detection_ray.pipelines.curate import upsert_docs

    got = upsert_docs(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["upsert_docs"]).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # structural invariants
    assert got["doc_id"].is_unique
    base = got[got["doc_id"] >= 0]
    ins = got[got["doc_id"] < 0]
    assert (ins["version"] == 1).all() and len(ins) > 0
    bucket = base["doc_id"].map(lambda d: md5_low64(str(int(d))) % 100)
    assert ((base["version"] == 1) == (bucket < 20)).all()
