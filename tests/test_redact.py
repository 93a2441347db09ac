"""PII-redaction kernel edge cases + full-query DuckDB oracle parity."""

import duckdb
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_redact_kernel_edges():
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        redact_text_batch,
    )

    t = pa.array(
        [
            "a.b+c_9%@sub.x-y.co trailing",          # full email charset
            "+1-555-1234 and +44-20-7946",           # second one too short -> no match
            "ip 10.0.0.1, ip2 255.255.255.255x",     # \b after digits: comma ok, x ok (x is a word char -> no \b) 
            "not-an-email@ or @no-local.com",        # malformed
            "",                                       # empty
            "x@y.io +1-202-0000 1.2.3.4 x@y.io",     # multiple classes, two emails
        ]
    )
    out = redact_text_batch(t)
    assert out["n_emails"].to_pylist() == [1, 0, 0, 0, 0, 2]
    assert out["n_phones"].to_pylist() == [0, 1, 0, 0, 0, 1]
    # "255.255.255.255x": trailing 'x' kills the word boundary -> only first ip
    assert out["n_ips"].to_pylist() == [0, 0, 1, 0, 0, 1]
    red = out["redacted_text"].to_pylist()
    assert red[0] == "[EMAIL] trailing"
    assert red[5] == "[EMAIL] [PHONE] [IP] [EMAIL]"
    assert red[4] == ""


def test_redact_docs_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.text_analysis import redact_docs

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["redact_docs"]).df()
    got = redact_docs(SF).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("doc_id").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every synthesized row carries exactly one of each PII class
    assert (got["n_emails"] == 1).all() and (got["n_phones"] == 1).all()
    assert (got["n_ips"] == 1).all()
    assert got["redacted_text"].str.contains("[EMAIL]", regex=False).all()


def test_stratified_sample_partition_invariance(ray_session):
    """The sample must be identical under different parallelism (combiner
    correctness: block-local pruning never drops a global top-k member)."""
    import __ray_entry__ as entrymod
    import duckdb

    from near_duplicate_detection_ray.pipelines.text_analysis import (
        stratified_sample_docs,
    )

    got = (
        stratified_sample_docs(SF)
        .to_pandas()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )
    # every stratum present with a full contiguous 1..k (or group-size) rank run
    for lang, g in got.groupby("lang"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["stratified_sample_docs"])
        .df()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False)


def test_top_terms_matches_oracle_sf0001(ray_session):
    import duckdb

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.text_analysis import top_terms_docs

    got = (
        top_terms_docs(SF)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["top_terms_docs"])
        .df()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    # exact equality INCLUDING the float score (one IEEE division both sides)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    assert (got.groupby("doc_id")["rank"].max() <= 3).all()


def test_normalize_docs_non_ascii_parity():
    """Review finding: the kernel must match DuckDB on NBSP / decomposed
    unicode, not just the ASCII corpus (pyarrow utf8_normalize is not
    form-conformant, so the kernel routes non-ASCII rows through
    unicodedata)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc
    import unicodedata

    cases = ["a\xa0b", "\xa0x", "café  NOIR", "\xa0 x \xa0", "  y  ", ""]
    text = pa.array(cases)
    ascii_mask = pc.equal(pc.utf8_length(text), pc.binary_length(text))
    am = ascii_mask.to_numpy(zero_copy_only=False)
    text = pa.array(
        [v if a else unicodedata.normalize("NFC", v)
         for v, a in zip(text.to_pylist(), am)],
        pa.string(),
    )
    eng = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(text), pattern=r"\s+", replacement=" "),
        characters=" ",
    ).to_pylist()
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT trim(regexp_replace(lower(nfc_normalize(?)), '\\s+', ' ', 'g'), ' ')",
            [c],
        ).fetchone()[0]
        for c in cases
    ]
    assert eng == want
