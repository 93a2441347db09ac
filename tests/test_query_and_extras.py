"""Tests for the query path (E3 parity), multimodal plumbing, winnowing,
SimHash pairs vs brute force, ANN recall, and label propagation."""

import numpy as np
import pyarrow as pa
import pytest

from near_duplicate_detection_ray.config import NDDConfig
from near_duplicate_detection_ray.functions.text import winnow_fingerprints
from near_duplicate_detection_ray.sources.transcripts import corpus_docs, synth_corpus

CFG = NDDConfig()
SF = "/root/testdata/sf0.001"


# --- query path -----------------------------------------------------------


@pytest.fixture(scope="module")
def index(ray_session):
    import ray.data as rd

    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline
    from near_duplicate_detection_ray.pipelines.query import NearDupIndex

    transcripts, _ = synth_corpus(seed=42)
    res = near_dup_pipeline(rd.from_arrow(transcripts), CFG, include_substring=False)
    idx = NearDupIndex(res["signatures"], CFG, rep_map=res["rep_map"])
    return transcripts, idx


def test_query_finds_own_duplicate(index):
    transcripts, idx = index
    docs = corpus_docs(transcripts)
    # probe with the text of an exact copy: its family rep must rank first
    hits = idx.query_text(docs["x00000"], k=5)
    assert hits and hits[0]["conv_id"] == "u00000"
    assert hits[0]["jaccard"] == 1.0
    assert hits[0]["rank"] == 1


def test_query_near_edit_ranks_source_first(index):
    transcripts, idx = index
    docs = corpus_docs(transcripts)
    hits = idx.query_text(docs["n00000"], k=5)
    assert hits[0]["jaccard"] == 1.0  # itself (n00000 is its own rep)
    assert any(h["jaccard"] >= CFG.tau and h["conv_id"] != "n00000" for h in hits)


def test_query_grouped_dedup_one_hit_per_family(index):
    transcripts, idx = index
    docs = corpus_docs(transcripts)
    hits = idx.query_text(docs["u00000"], k=30)
    # u00000 has exact copies (x-family shares fingerprint): only ONE hit for
    # that family may appear
    fam = [h for h in hits if h["jaccard"] == 1.0]
    assert len(fam) == 1


def test_query_k_and_degenerate(index):
    _, idx = index
    assert idx.query_text("", k=5) == []
    assert idx.query_text("    \t ", k=5) == []
    boiler_hits = idx.query_text(corpus_docs(synth_corpus(seed=42)[0])["b00000"], k=3)
    assert len(boiler_hits) <= 3


def test_index_actor(index, ray_session):
    import ray

    from near_duplicate_detection_ray.pipelines.query import IndexActor

    transcripts, idx = index
    # persist signatures + rep_map, serve from the actor
    import ray.data as rd

    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline

    res = near_dup_pipeline(rd.from_arrow(transcripts), CFG, include_substring=False)
    res["signatures"].write_parquet("/tmp/ndd_idx_sigs")
    res["rep_map"].write_parquet("/tmp/ndd_idx_repmap")
    actor = IndexActor.remote("/tmp/ndd_idx_sigs", rep_map_path="/tmp/ndd_idx_repmap")
    docs = corpus_docs(transcripts)
    hits = ray.get(actor.query.remote(docs["x00001"], 5))
    assert hits and hits[0]["jaccard"] == 1.0
    assert ray.get(actor.size.remote()) > 0
    ray.kill(actor)


# --- multimodal -----------------------------------------------------------


def test_media_featurizer_deterministic():
    from near_duplicate_detection_ray.pipelines.multimodal import (
        FEATURE_DIM,
        FEATURES_SCHEMA,
        MediaFeaturizer,
    )

    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([b"hello", b"world"], pa.binary()),
            "media_type": pa.array(["image", "audio"], pa.string()),
            "n_bytes": pa.array([5, 5], pa.int64()),
        }
    )
    f = MediaFeaturizer(mode="fake")
    out1, out2 = f(batch), f(batch)
    assert out1.schema.equals(FEATURES_SCHEMA)
    assert out1.equals(out2)
    assert len(out1["feature"][0].as_py()) == FEATURE_DIM
    # strict mode raises at the decode boundary
    with pytest.raises(NotImplementedError, match="image"):
        MediaFeaturizer(mode="strict")(batch)
    with pytest.raises(ValueError):
        MediaFeaturizer(mode="bogus")


def test_media_pipeline_end_to_end(ray_session):
    from near_duplicate_detection_ray.pipelines.multimodal import media_features

    feats = media_features(SF).to_pandas()
    assert len(feats) == 500
    assert set(feats["media_type"]) == {"image", "audio", "video"}
    assert all(len(v) == 16 for v in feats["feature"])


# --- winnowing ------------------------------------------------------------


def test_winnow_fingerprints_properties():
    assert winnow_fingerprints([], 4) == []
    assert winnow_fingerprints([5], 4) == [5]
    assert winnow_fingerprints([3, 1, 2], 4) == [1]
    fps = winnow_fingerprints([9, 8, 7, 6, 5, 4, 3, 2, 1], 3)
    assert fps == [7, 6, 5, 4, 3, 2, 1]  # strictly decreasing: new min each window
    # guarantee: a shared long substring shares fingerprints
    base = [17, 42, 8, 99, 23, 5, 61, 33, 70, 12]
    shifted = [100, 101] + base + [102]
    shared = set(winnow_fingerprints(base, 3)) & set(winnow_fingerprints(shifted, 3))
    assert shared


# --- simhash pairs vs brute force ----------------------------------------


def test_simhash_pairs_match_bruteforce(ray_session):
    """Banded-chunk search == brute force over the md5-basis simhashes
    (pigeonhole exactness for radius <= 3)."""
    from near_duplicate_detection_ray.functions.hashing import hamming_distance
    from near_duplicate_detection_ray.pipelines.docs_dedup import (
        DOCS_DEDUP_CFG,
        md5_simhash_docs,
        simhash_pairs_docs,
    )

    pairs = simhash_pairs_docs(SF).to_pandas()
    engine = set(zip(pairs["a"], pairs["b"]))

    sigs = md5_simhash_docs(SF, DOCS_DEDUP_CFG).to_pandas()
    sigs = sigs[~sigs["is_degenerate"]]
    ids = sigs["conv_id"].to_numpy()
    sims = sigs["simhash"].to_numpy().astype(np.uint64)
    brute = set()
    for i in range(len(ids)):
        h = hamming_distance(np.full(len(ids) - i - 1, sims[i], dtype=np.uint64),
                             sims[i + 1:])
        for j in np.nonzero(h <= DOCS_DEDUP_CFG.hamming_radius)[0]:
            x, y = int(ids[i]), int(ids[i + 1 + j])
            brute.add((min(x, y), max(x, y)))
    assert engine == brute  # pigeonhole banding is exact for radius <= 3


# --- ANN recall -----------------------------------------------------------


def test_ann_lsh_recall_vs_exact(ray_session):
    from near_duplicate_detection_ray.pipelines.ann import ann_lsh_topk, cosine_topk

    exact = cosine_topk(SF, n_queries=10, k=5).to_pandas()
    approx = ann_lsh_topk(SF, n_queries=10, k=5).to_pandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH ANN recall {recall:.2f} unexpectedly low"


# --- distributed label propagation vs driver union-find -------------------


def test_propagate_labels_matches_unionfind(ray_session):
    import ray.data as rd

    from near_duplicate_detection_ray.pipelines.dedup import exact_edges, near_dup_pipeline
    from near_duplicate_detection_ray.stages.cluster import propagate_labels

    transcripts, _ = synth_corpus(seed=42)
    res = near_dup_pipeline(rd.from_arrow(transcripts), CFG, include_substring=False)
    uf = res["clusters"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    lp = (
        propagate_labels(
            res["conversations"],
            [exact_edges(res["rep_map"]), res["dup_pairs"]],
        )
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert list(lp.columns) == ["conv_id", "cluster_id"]
    assert uf.equals(lp[["conv_id", "cluster_id"]])


def test_query_partial_text_containment(index):
    """A truncated snippet of an indexed conversation must still find it via
    the anchor-bucket containment probe."""
    transcripts, idx = index
    docs = corpus_docs(transcripts)
    full = docs["u00000"]
    snippet = " ".join(full.split()[: len(full.split()) // 2])  # first half
    hits = idx.query_text(snippet, k=5)
    assert hits, "partial probe found nothing"
    assert hits[0]["conv_id"] == "u00000"
    assert hits[0]["containment"] > 0.9


def test_media_chunk_dedup_planted_and_oracle(ray_session, tmp_path_factory):
    """A chunk shared by two payloads at different offsets is found; the
    sf0.001 output matches the DuckDB oracle byte-for-byte."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod
    from near_duplicate_detection_ray.pipelines.multimodal import media_chunk_dedup

    # planted: docs 0 and 1 share their FIRST 256 bytes (one full window);
    # doc 2 is unique. stride 192 means doc 0's chunk@192 differs from doc 1's.
    d = str(tmp_path_factory.mktemp("chunkdedup"))
    common = ("abcd " * 52)[:256]          # exactly one window of shared bytes
    rows = [
        (0, common + "tail-zero " * 10),
        (1, common + "tail-one " * 12),
        (2, "completely unrelated payload " * 12),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["t"] * 3, pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        f"{d}/documents.parquet",
    )
    got = media_chunk_dedup(d).to_pandas()
    assert len(got) == 1  # only the shared first window duplicates
    assert got.iloc[0]["n_occurrences"] == 2 and got.iloc[0]["n_media"] == 2

    got = (
        media_chunk_dedup(SF)
        .to_pandas()
        .sort_values("chunk_hash")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(entrymod.oracle_sql()["media_chunk_dedup"])
        .df()
        .sort_values("chunk_hash")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ann_nsw_full_ef_equals_exact(ray_session):
    """Sharded NSW with ef >= shard size visits every reachable node (NSW
    insertion keeps each shard connected), so the merged result must EQUAL
    the exact brute-force scan."""
    from near_duplicate_detection_ray.pipelines.ann import (
        ann_nsw_topk,
        cosine_topk,
    )

    sf = "/root/testdata/sf0.001"
    exact = cosine_topk(sf).to_pandas().reset_index(drop=True)
    got = ann_nsw_topk(sf, ef=100_000).to_pandas().reset_index(drop=True)
    assert exact[["query_id", "rank", "neighbor_id"]].equals(
        got[["query_id", "rank", "neighbor_id"]]
    )


def test_ann_nsw_global_refine_equals_exact(ray_session):
    """refine="global" (the SQL-graduation mode): the NSW pass only PRUNES —
    its k-th-best score lower-bounds the true k-th-best cosine — so the
    threshold-refined output must EQUAL the exact scan at ANY bounded ef,
    including a deliberately tiny beam."""
    from near_duplicate_detection_ray.pipelines.ann import (
        ann_nsw_topk,
        cosine_topk,
    )

    sf = "/root/testdata/sf0.001"
    exact = cosine_topk(sf).to_pandas().reset_index(drop=True)
    for ef in (8, 48):
        got = (
            ann_nsw_topk(sf, ef=ef, refine="global")
            .to_pandas()
            .reset_index(drop=True)
        )
        assert exact[["query_id", "rank", "neighbor_id"]].equals(
            got[["query_id", "rank", "neighbor_id"]]
        ), f"refine mismatch at ef={ef}"


def test_ann_nsw_bounded_ef_recall(ray_session):
    """Default bounded beam stays approximate but must keep high recall vs
    the exact scan."""
    from near_duplicate_detection_ray.pipelines.ann import (
        ann_nsw_topk,
        cosine_topk,
    )

    sf = "/root/testdata/sf0.001"
    exact = cosine_topk(sf).to_pandas()
    got = ann_nsw_topk(sf).to_pandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    g = set(zip(got["query_id"], got["neighbor_id"]))
    recall = len(e & g) / len(e)
    assert recall >= 0.8, f"NSW recall {recall:.2f} too low"
