"""chunk_docs (RAG token windows) and bigram_novelty_docs: hand-computed
semantics on tiny corpora + DuckDB oracle parity at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_chunk_docs_hand_semantics(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines.text_analysis import chunk_docs

    sf = _write_docs(tmp_path, ["a b c d e", "", "x", "  p  q  "])
    out = (
        chunk_docs(sf, size=3, stride=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    got = list(
        zip(out["doc_id"], out["chunk_idx"], out["chunk_text"], out["n_tokens"])
    )
    assert got == [
        (0, 0, "a b c", 3),
        (0, 1, "c d e", 3),
        (0, 2, "e", 1),
        (2, 0, "x", 1),
        (3, 0, "p q", 2),
    ]


def test_chunk_docs_coverage_invariants(ray_session):
    """Every non-blank doc: chunk count = ceil(n_tokens/stride), indices are
    0..c-1, full-size windows except possibly trailing ones, and stitching
    each chunk's post-overlap suffix reconstructs the token stream."""
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        chunk_docs,
        token_counts,
    )

    size, stride = 32, 24
    out = chunk_docs(SF).to_pandas()
    ntok = token_counts(SF).to_pandas().set_index("doc_id")["n_tokens"]
    for doc_id, g in out.groupby("doc_id"):
        n = int(ntok[doc_id])
        c = -(-n // stride)
        g = g.sort_values("chunk_idx")
        assert list(g["chunk_idx"]) == list(range(c))
        assert (
            g["n_tokens"].to_numpy()
            == [min(size, n - i * stride) for i in range(c)]
        ).all()
        # reconstruction: chunk 0 in full, then each chunk's tokens beyond
        # the (size - stride)-token overlap with its predecessor
        toks = []
        for i, chunk in enumerate(g["chunk_text"]):
            parts = chunk.split(" ")
            toks.extend(parts if i == 0 else parts[size - stride:])
        assert len(toks) == n
    # blank docs emit nothing; all others emit >= 1 chunk
    assert set(out["doc_id"]) == set(ntok[ntok > 0].index)


def test_chunk_docs_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.text_analysis import chunk_docs

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["chunk_docs"]).df()
    got = chunk_docs(SF).to_pandas()
    key = ["doc_id", "chunk_idx"]
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bigram_novelty_hand_semantics(ray_session, tmp_path):
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        bigram_novelty_docs,
    )

    sf = _write_docs(tmp_path, ["a b a b", "a b c", "", "tok"])
    out = (
        bigram_novelty_docs(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # corpus counts: "a b"=3, "b a"=1, "b c"=1
    want = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "n_bigrams": [3, 2, 0, 0],
            "n_distinct_bigrams": [2, 2, 0, 0],
            "n_self_bigrams": [1, 1, 0, 0],
            "familiarity_w": [2 * 3 + 1 * 1, 1 * 3 + 1 * 1, 0, 0],
        }
    )
    pd.testing.assert_frame_equal(
        out[want.columns], want, check_dtype=False
    )


def test_bigram_novelty_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        bigram_novelty_docs,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["bigram_novelty_docs"]).df()
    got = bigram_novelty_docs(SF).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("doc_id").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # novelty sanity: self <= distinct <= total; familiarity >= total
    assert (got["n_self_bigrams"] <= got["n_distinct_bigrams"]).all()
    assert (got["n_distinct_bigrams"] <= got["n_bigrams"]).all()
    assert (got["familiarity_w"] >= got["n_bigrams"]).all()


def test_keyword_search_matches_oracle_sf0001(ray_session):
    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        keyword_search_docs,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(entrymod.oracle_sql()["keyword_search_docs"]).df()
    got = keyword_search_docs(SF).to_pandas()
    assert len(got) == 10
    # arrives globally sorted (score desc, doc_id asc)
    sc = got["score"].to_numpy()
    assert (sc[:-1] >= sc[1:]).all()
    key = ["doc_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[sorted(got.columns)],
        want.sort_values(key).reset_index(drop=True)[sorted(want.columns)],
        check_dtype=False,
    )


def test_keyword_search_exact_rational_score(ray_session, tmp_path):
    """Hand check: score == sum(tf_i * N / df_i) with exact single division."""
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        keyword_search_docs,
    )

    sf = _write_docs(
        tmp_path,
        [
            "spark spark window",   # tf = (2, 1, 0)
            "hash table scan",      # tf = (0, 0, 1)
            "window window window", # tf = (0, 3, 0)
            "plain text here",      # no hits -> absent
        ],
    )
    got = (
        keyword_search_docs(sf, k=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = 4
    df1, df2, df3 = 1, 2, 1
    assert got["doc_id"].tolist() == [0, 1, 2]
    assert got["n_hit_terms"].tolist() == [2, 1, 1]
    want = [
        (2 * n * df2 * df3 + 1 * n * df1 * df3) / (df1 * df2 * df3),
        (1 * n * df1 * df2) / (df1 * df2 * df3),
        (3 * n * df1 * df3) / (df1 * df2 * df3),
    ]
    assert got["score"].tolist() == want


def _oracle_docs(name: str) -> pd.DataFrame:
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(entrymod.oracle_sql()[name]).df()


def test_pack_sequences_matches_oracle_sf0001(ray_session):
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        pack_sequences_docs,
    )

    want = _oracle_docs("pack_sequences_docs")
    got = pack_sequences_docs(SF).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("doc_id").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # prefix-sum invariants: offsets are the exclusive cumsum in doc_id order
    g = got.sort_values("doc_id")
    assert (
        g["start_tok"].to_numpy()
        == np.concatenate([[0], np.cumsum(g["n_tokens"].to_numpy())[:-1]])
    ).all()
    assert (g["last_seq"] >= g["first_seq"]).all()


def test_token_pmi_hand_semantics(ray_session, tmp_path):
    """Two docs; 'a b' occurs 6x (passes min_count=5), everything else is
    rare.  lift('a b') = c_xy * N / (c_a * c_b)."""
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        token_pmi_pairs,
    )

    sf = _write_docs(tmp_path, ["a b a b a b", "a b a b a b c"])
    got = token_pmi_pairs(sf, min_count=5, k=5).to_pandas()
    # tokens: doc0 6, doc1 7 -> N = 13; c_a = 6, c_b = 6, c_ab = 6
    assert got["gram"].tolist() == ["a b"]
    assert got["c_xy"].tolist() == [6]
    assert got["c_x"].tolist() == [6] and got["c_y"].tolist() == [6]
    assert got["lift"].tolist() == [6 * 13 / (6 * 6)]


def test_token_pmi_matches_oracle_sf0001(ray_session):
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        token_pmi_pairs,
    )

    want = _oracle_docs("token_pmi_pairs")
    got = token_pmi_pairs(SF).to_pandas()
    got = got.sort_values("gram").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("gram").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_source_report_matches_oracle_sf0001(ray_session):
    from near_duplicate_detection_ray.pipelines.text_analysis import source_report

    want = _oracle_docs("source_report")
    got = source_report(SF).to_pandas()
    got = got.sort_values("source").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("source").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_dup_docs"] <= got["n_docs"]).all()


def test_token_pmi_control_char_tokens(ray_session, tmp_path):
    """Regression: tokens may contain any non-whitespace byte (e.g. \\x1f);
    the bigram key join/split must not corrupt such pairs."""
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        token_pmi_pairs,
    )

    weird = "a\x1fb"
    sf = _write_docs(tmp_path, [f"{weird} c " * 6])
    got = token_pmi_pairs(sf, min_count=5, k=5).to_pandas()
    grams = set(got["gram"])
    assert f"{weird} c" in grams
    # 12 tokens alternating ('a\x1fb', 'c') x 6 reps
    row = got[got["gram"] == f"{weird} c"].iloc[0]
    assert row["c_xy"] == 6 and row["c_x"] == 6 and row["c_y"] == 6


def test_quality_percentile_matches_oracle_sf0001(ray_session):
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        quality_percentile_docs,
    )

    want = _oracle_docs("quality_percentile_docs")
    got = quality_percentile_docs(SF).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("doc_id").reset_index(drop=True)[sorted(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # percent_rank bounds + monotonicity in n_tokens
    assert got["pct_rank"].between(0.0, 1.0).all()
    g = got.sort_values(["n_tokens", "pct_rank"])
    assert (g["pct_rank"].diff().fillna(0) >= 0).all()


def test_vocab_coverage_hand_semantics(ray_session, tmp_path):
    """Counts: a=4, b=2, c,d=1 each (8 tokens).  v50: a alone covers 4/8 =
    50% -> rank 1; v90: a+b = 6/8 = 75% < 90%, +c = 7/8 = 87.5% < 90%,
    +d = 100% -> rank 4."""
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        vocab_coverage,
    )

    sf = _write_docs(tmp_path, ["a a b c", "a a b d", ""])
    got = vocab_coverage(sf).to_pandas().iloc[0]
    assert got["n_words"] == 8 and got["n_distinct_words"] == 4
    assert got["v50"] == 1 and got["v90"] == 4 and got["v99"] == 4


def test_vocab_coverage_matches_oracle_sf0001(ray_session):
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        vocab_coverage,
    )

    want = _oracle_docs("vocab_coverage")
    got = vocab_coverage(SF).to_pandas()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    row = got.iloc[0]
    assert row["v50"] <= row["v90"] <= row["v99"] <= row["n_distinct_words"]


def test_pack_sequences_multiblock_prefix(ray_session):
    """The cross-block prefix sum must be partition-invariant: forcing 7
    blocks (several per-block offsets) yields the identical manifest."""
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        pack_sequences_docs,
    )

    one = (
        pack_sequences_docs(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    many = (
        pack_sequences_docs(SF, num_blocks=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)


def test_bpe_merge_candidates_hand_semantics(ray_session, tmp_path):
    """'ab' appears inside 'abab' twice and 'ab' once = 3; cross-token pairs
    ('b a' boundary inside 'ab ab') never count."""
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        bpe_merge_candidates,
    )

    sf = _write_docs(tmp_path, ["abab ab", "ba", ""])
    got = bpe_merge_candidates(sf, k=10).to_pandas()
    m = dict(zip(got["pair"], got["n"]))
    assert m["ab"] == 3     # ab-ab (x2) + ab
    assert m["ba"] == 2     # inside abab + the doc 'ba'
    assert " a" not in m and "b " not in m


def test_bpe_merge_candidates_matches_oracle_sf0001(ray_session):
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        bpe_merge_candidates,
    )

    want = _oracle_docs("bpe_merge_candidates")
    got = bpe_merge_candidates(SF).to_pandas()
    got = got.sort_values(["n", "pair"], ascending=[False, True]).reset_index(drop=True)
    want = want.sort_values(["n", "pair"], ascending=[False, True]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False)
