"""sf0.001 oracle-conformance pins for the round-3 dedup additions
(conv_prefix_dups turn-boundary prefix containment, shuffled_dup_convs
order-insensitive multiset dedup), plus exact Python-mirror semantics tests
on the synthetic corpus with its planted substring / turn-shuffled families."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

NEW_QUERIES = [
    "conv_prefix_dups",
    "shuffled_dup_convs",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return (
        df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    )


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle_sf0001(ray_session, name):
    import __ray_entry__ as entrymod

    got = entrymod.queries()[name](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    assert len(got) > 0, f"{name} returned no rows — planted families missing"
    want = _oracle(entrymod.oracle_sql()[name])
    pd.testing.assert_frame_equal(
        _norm(got), _norm(want), check_dtype=False, rtol=0, atol=5e-9
    )


def _synth_conv_turns() -> dict[str, list[str]]:
    """conv_id -> ordered non-empty turn texts of the synthetic corpus (the
    same empty-turn-absent view both operators compute over)."""
    from near_duplicate_detection_ray.sources.transcripts import synth_corpus

    transcripts, _truth = synth_corpus()
    df = transcripts.to_pandas().sort_values(["conv_id", "turn_idx"])
    df = df[df["text"] != ""]
    return {cid: g["text"].tolist() for cid, g in df.groupby("conv_id")}


def test_conv_prefix_dups_matches_python_mirror(ray_session):
    """Engine pairs == brute-force proper-turn-prefix pairs on the synthetic
    corpus, and every planted 'substring' conv (base turns + appended tail)
    is found as a container of its family base."""
    import ray.data as rd

    from near_duplicate_detection_ray.pipelines.dedup import conv_prefix_dups
    from near_duplicate_detection_ray.sources.transcripts import synth_corpus

    transcripts, truth = synth_corpus()
    convs = _synth_conv_turns()
    expected = set()
    for a, ta in convs.items():
        for b, tb in convs.items():
            if len(tb) > len(ta) and tb[: len(ta)] == ta:
                expected.add((a, b, len(ta), len(tb)))

    got = conv_prefix_dups(rd.from_arrow(transcripts)).to_pandas()
    got_set = set(
        zip(got["a"], got["b"], got["n_shared_turns"].astype(int),
            got["b_n_turns"].astype(int))
    )
    assert got_set == expected

    fam = dict(zip(truth["conv_id"].to_pylist(), truth["family_id"].to_pylist()))
    subs = [c for c, k in zip(truth["conv_id"].to_pylist(),
                              truth["kind"].to_pylist()) if k == "substring"]
    assert subs
    containers = {}
    for a, b, _, _ in got_set:
        containers.setdefault(b, set()).add(a)
    for c in subs:
        assert any(fam[a] == fam[c] for a in containers.get(c, ())), c


def test_shuffled_dup_convs_matches_python_mirror(ray_session):
    """Engine groups == brute-force turn-multiset groups on the synthetic
    corpus, and the planted turn-shuffled copies surface as groups whose
    n_orderings exceeds 1 whenever the permutation changed the order."""
    import ray.data as rd

    from near_duplicate_detection_ray.pipelines.dedup import shuffled_dup_convs
    from near_duplicate_detection_ray.sources.transcripts import synth_corpus

    transcripts, truth = synth_corpus()
    convs = _synth_conv_turns()
    groups: dict[tuple, list[str]] = {}
    for cid, turns in convs.items():
        groups.setdefault(tuple(sorted(turns)), []).append(cid)
    expected = {
        (min(cids), len(cids), len({tuple(convs[c]) for c in cids}))
        for cids in groups.values() if len(cids) >= 2
    }

    got = shuffled_dup_convs(rd.from_arrow(transcripts)).to_pandas()
    got_set = set(
        zip(got["rep_id"], got["n_convs"].astype(int),
            got["n_orderings"].astype(int))
    )
    assert got_set == expected

    kinds = dict(zip(truth["conv_id"].to_pylist(), truth["kind"].to_pylist()))
    fam = dict(zip(truth["conv_id"].to_pylist(), truth["family_id"].to_pylist()))
    shuffled = [c for c, k in kinds.items() if k == "turn-shuffled"]
    assert shuffled
    # every shuffled copy whose permutation actually changed the turn order
    # must land in a reported group with n_orderings >= 2
    rep_by_group = {tuple(sorted(convs[min(cids)])): (min(cids), len(cids))
                    for cids in groups.values() if len(cids) >= 2}
    for c in shuffled:
        base = [b for b, f in fam.items()
                if f == fam[c] and kinds[b] == "unique"][0]
        key = tuple(sorted(convs[c]))
        assert key in rep_by_group, c
        if convs[c] != convs[base]:
            rep, _n = rep_by_group[key]
            row = got[got["rep_id"] == rep]
            assert int(row["n_orderings"].iloc[0]) >= 2, c
