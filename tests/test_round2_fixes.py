"""Round-2 regression tests for the ADVICE findings:

1. ``near_dup_pairs_docs`` must not leak method='substring' rows (containment
   pairs below tau) into its jaccard>=tau contract.
2. ``attach_signatures`` must survive sparse corpora where distinct candidate
   pairs < num_partitions (zero-column empty blocks between chained joins).
3. ``StageCheckpointer.run_stage`` must handle an EMPTY stage dataset (a corpus
   with no duplicates): write a schema-carrying empty parquet, resume cleanly.
"""

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DOCS_DIR = "/tmp/ndd_sparse_docs"


@pytest.fixture(scope="module")
def sparse_docs_dir(ray_session):
    """10 docs: one containment pair (1 is a 60-token prefix of 0, jaccard
    ~0.58 < tau), one exact pair (2 == 3, jaccard 1.0), rest unique."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i:04d}" for i in range(500)]

    def txt(n):
        return " ".join(vocab[i] for i in rng.integers(0, len(vocab), size=n))

    base = txt(100)
    prefix = " ".join(base.split()[:60])
    exact = txt(80)
    texts = [base, prefix, exact, exact] + [txt(90) for _ in range(6)]
    shutil.rmtree(DOCS_DIR, ignore_errors=True)
    import os

    os.makedirs(DOCS_DIR)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        f"{DOCS_DIR}/documents.parquet",
    )
    return DOCS_DIR


def test_near_dup_pairs_excludes_containment_pairs(sparse_docs_dir):
    """The (0, 1) containment pair has jaccard < tau and must NOT appear; the
    exact (2, 3) pair must.  Also exercises the sparse-corpus join path
    (2 candidate pairs << num_partitions)."""
    from near_duplicate_detection_ray.pipelines.docs_dedup import near_dup_pairs_docs

    df = near_dup_pairs_docs(sparse_docs_dir).to_pandas()
    pairs = set(zip(df["a"], df["b"]))
    assert (0, 1) not in pairs, "substring-method row leaked into jaccard>=tau output"
    assert (2, 3) in pairs
    assert (df["jaccard"] >= 0.8).all()


def test_substring_pairs_sparse_corpus(sparse_docs_dir):
    """The full flagship path on a tiny corpus with one containment pair:
    attach_signatures' chained joins must not crash on empty partitions, and
    the substring pass must confirm (0, 1)."""
    import ray.data as rd

    from near_duplicate_detection_ray.config import NDDConfig
    from near_duplicate_detection_ray.pipelines.docs_dedup import docs_as_conversations
    from near_duplicate_detection_ray.stages.signatures import sign_conversations
    from near_duplicate_detection_ray.stages.substring import substring_pairs
    from near_duplicate_detection_ray.state.partitioning import materialize_clean

    convs = materialize_clean(docs_as_conversations(sparse_docs_dir))
    sigs = materialize_clean(sign_conversations(convs, NDDConfig()))
    got = substring_pairs(sigs, convs, NDDConfig()).to_pandas()
    assert set(zip(got["a"], got["b"])) == {("000000000000", "000000000001")}


def test_batch_jaccard_containment_matches_scalar():
    """The vectorized lexsort kernel must agree with the scalar per-pair
    functions on random packed sets, including empty-set edge cases."""
    from near_duplicate_detection_ray.functions.similarity import (
        batch_jaccard_containment,
        containment_sorted,
        jaccard_sorted,
    )

    rng = np.random.default_rng(11)
    sets = []
    for _ in range(40):
        k = int(rng.integers(0, 30))
        sets.append(np.unique(rng.integers(0, 50, size=k).astype(np.uint64)))
    sets.append(np.empty(0, dtype=np.uint64))  # force empty-vs-empty and empty-vs-nonempty
    sets.append(np.empty(0, dtype=np.uint64))
    pairs = [(i, j) for i in range(len(sets)) for j in range(i, len(sets))]
    blobs_a = [sets[i].tobytes() for i, _ in pairs]
    blobs_b = [sets[j].tobytes() for _, j in pairs]
    jac, cont = batch_jaccard_containment(blobs_a, blobs_b)
    for k, (i, j) in enumerate(pairs):
        assert jac[k] == pytest.approx(jaccard_sorted(sets[i], sets[j]))
        assert cont[k] == pytest.approx(containment_sorted(sets[i], sets[j]))


def test_distinct_values_ref_off_driver(ray_session):
    """distinct_values_ref must return the exact distinct union of the columns
    and honor the max_values fallback."""
    import ray
    import ray.data as rd

    from near_duplicate_detection_ray.state.partitioning import (
        distinct_values_ref,
        semi_filter,
    )

    tbl = pa.table(
        {
            "a": pa.array([f"x{i % 7}" for i in range(100)], pa.string()),
            "b": pa.array([f"y{i % 5}" for i in range(100)], pa.string()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(6)
    ids_ref, n = distinct_values_ref(ds, ["a", "b"])
    assert n == 12
    ids = ray.get(ids_ref)
    assert set(ids.to_pylist()) == {f"x{i}" for i in range(7)} | {f"y{i}" for i in range(5)}

    none_ref, n2 = distinct_values_ref(ds, ["a", "b"], max_values=5)
    assert none_ref is None and n2 == 12

    side = rd.from_arrow(
        pa.table({"conv_id": pa.array(["x0", "x1", "z9"], pa.string())})
    )
    kept = semi_filter(side, "conv_id", ids_ref).to_pandas()
    assert sorted(kept["conv_id"]) == ["x0", "x1"]


TRICKY_TEXTS = [
    "",
    "   \t  ",
    "The quick brown fox... and THE lazy dog!!",
    "der die und das ist nicht mit",
    "le la et les des en un une",
    "el la y de que en un",
    "123 456 !!! ??? ...",
    "it's the (best) \"thing\", truly; on: a-list.",
    "wordswithoutstops xyzzy plugh",
    "the the the der der le le el el",  # exact vote ties -> alphabetical min
    "a\nb\tc  d",
    "ünïcödé tëxt mit der die und",
]


def test_vectorized_text_kernels_match_scalar(ray_session, tmp_path):
    """token_counts / quality_scores / lang_id_docs (Arrow-kernel versions)
    must agree with the scalar reference functions in functions/text.py."""
    import os

    from near_duplicate_detection_ray.functions.text import (
        lang_id,
        quality_metrics,
        token_count,
    )
    from near_duplicate_detection_ray.pipelines.text_analysis import (
        lang_id_docs,
        quality_scores,
        token_counts,
    )

    d = str(tmp_path / "docs")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(TRICKY_TEXTS))), pa.int64()),
                "text": pa.array(TRICKY_TEXTS, pa.string()),
            }
        ),
        f"{d}/documents.parquet",
    )

    tc = token_counts(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert tc["n_tokens"].tolist() == [token_count(t) for t in TRICKY_TEXTS]

    qs = quality_scores(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, text in enumerate(TRICKY_TEXTS):
        ref = quality_metrics(text)
        for k in ("punct_ratio", "digit_ratio", "alpha_ratio", "stopword_ratio"):
            assert qs.loc[i, k] == pytest.approx(ref[k]), (k, text)
        assert qs.loc[i, "n_chars"] == int(ref["n_chars"])
        assert qs.loc[i, "n_tokens"] == int(ref["n_tokens"])

    li = lang_id_docs(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert li["lang_pred"].tolist() == [lang_id(t) for t in TRICKY_TEXTS]


@pytest.fixture(scope="module")
def planted_emb_dir(ray_session, tmp_path_factory):
    """300 embeddings: 250 background + 50 perturbed copies of the first 50
    (cosine ~0.97 to their source) — the LSH recall corpus."""
    import os

    rng = np.random.default_rng(3)
    base = rng.standard_normal((250, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[:50] + 0.03 * rng.standard_normal((50, 64))  # noise norm ~0.24 -> cos ~0.97
    mat = np.concatenate([base, dups]).astype(np.float32)
    d = str(tmp_path_factory.mktemp("emb"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(len(mat))), pa.int64()),
                "embedding": pa.array([row.tolist() for row in mat],
                                      pa.list_(pa.float32())),
                "label": pa.array([0] * len(mat), pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    return d


def test_embedding_dup_pairs_block_exact_matches_bruteforce(planted_emb_dir):
    """The block-pair exact path must equal the driver-side brute force."""
    from near_duplicate_detection_ray.pipelines.ann import embedding_dup_pairs

    t = pq.read_table(f"{planted_emb_dir}/embeddings.parquet")
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    iu = np.triu_indices(len(m), 1)
    expected = {
        (int(a), int(b))
        for a, b in zip(iu[0][sims[iu] >= 0.9], iu[1][sims[iu] >= 0.9])
    }
    assert expected, "fixture must contain planted pairs"

    got = embedding_dup_pairs(planted_emb_dir, threshold=0.9, num_blocks=5).to_pandas()
    assert set(zip(got["a"], got["b"])) == expected


def test_embedding_dup_pairs_lsh_recall(planted_emb_dir):
    """LSH path recall >= 0.99 vs the exact path at threshold 0.9, with exact
    precision (bucket members are verified with exact cosine)."""
    from near_duplicate_detection_ray.pipelines.ann import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    exact = embedding_dup_pairs(planted_emb_dir, threshold=0.9, num_blocks=4).to_pandas()
    lsh = embedding_dup_pairs_lsh(planted_emb_dir, threshold=0.9).to_pandas()
    e = set(zip(exact["a"], exact["b"]))
    l = set(zip(lsh["a"], lsh["b"]))
    assert l <= e, "LSH emitted a pair below threshold (precision violation)"
    recall = len(l & e) / len(e)
    assert recall >= 0.99, f"LSH recall {recall:.3f} < 0.99"


def test_cluster_auto_switch_equivalence(ray_session):
    """Forcing the distributed large-star/small-star path (max_driver_edges=0)
    must yield exactly the same clusters as the driver union-find default."""
    import ray.data as rd

    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline
    from near_duplicate_detection_ray.sources.transcripts import synth_corpus

    transcripts, _ = synth_corpus(seed=42)
    ds = rd.from_arrow(transcripts)
    default = (
        near_dup_pipeline(ds, include_substring=True)["clusters"]
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    forced = (
        near_dup_pipeline(ds, include_substring=True, max_driver_edges=0)["clusters"]
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert default.equals(forced)


def test_incremental_signature_store(ray_session, tmp_path):
    """T3/D4 parity: appending one conversation recomputes exactly one bucket;
    removing a bucket's last conversation evicts its partition; reused buckets
    do zero signing work; the store always equals a full recompute."""
    import ray.data as rd

    from near_duplicate_detection_ray.functions.hashing import md5_low64
    from near_duplicate_detection_ray.sources.transcripts import synth_corpus
    from near_duplicate_detection_ray.stages.assemble import assemble_conversations
    from near_duplicate_detection_ray.stages.incremental import IncrementalSignatureStore

    N_BUCKETS = 64
    transcripts, _ = synth_corpus(seed=42)
    convs_tbl = (
        assemble_conversations(rd.from_arrow(transcripts))
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    all_ids = convs_tbl["conv_id"].tolist()

    def as_ds(df):
        return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))

    store = IncrementalSignatureStore(str(tmp_path / "sigstore"), n_buckets=N_BUCKETS)

    # initial build: every populated bucket computes
    r1 = store.update(as_ds(convs_tbl))
    assert r1["buckets_reused"] == [] and r1["rows_written"] == len(convs_tbl)
    assert r1["signatures"].count() == len(convs_tbl)

    # no-op rerun: everything reused, nothing written
    r2 = store.update(as_ds(convs_tbl))
    assert r2["buckets_changed"] == [] and r2["buckets_evicted"] == []
    assert r2["rows_written"] == 0
    assert sorted(r2["buckets_reused"]) == sorted(r1["buckets_changed"])

    # append ONE conversation -> exactly its bucket recomputes
    new_row = convs_tbl.iloc[[0]].copy()
    new_row["conv_id"] = "zzz-new-conv"
    appended = __import__("pandas").concat([convs_tbl, new_row], ignore_index=True)
    r3 = store.update(as_ds(appended))
    assert r3["buckets_changed"] == [md5_low64("zzz-new-conv") % N_BUCKETS]
    assert r3["buckets_evicted"] == []
    assert r3["signatures"].count() == len(appended)

    # remove a conversation that is ALONE in its bucket -> eviction
    buckets = {c: md5_low64(c) % N_BUCKETS for c in appended["conv_id"]}
    from collections import Counter

    counts = Counter(buckets.values())
    lone = next(c for c in appended["conv_id"] if counts[buckets[c]] == 1)
    removed = appended[appended["conv_id"] != lone].reset_index(drop=True)
    r4 = store.update(as_ds(removed))
    assert r4["buckets_evicted"] == [buckets[lone]]
    assert r4["buckets_changed"] == []
    sig_ids = set(r4["signatures"].to_pandas()["conv_id"])
    assert sig_ids == set(removed["conv_id"])  # evicted conv is gone


def test_index_incremental_ingest_and_evict(ray_session):
    """NearDupIndex.ingest adds new conversations without a rebuild and
    evict removes them from query results (update_index parity)."""
    import ray.data as rd

    from near_duplicate_detection_ray.config import NDDConfig
    from near_duplicate_detection_ray.pipelines.query import NearDupIndex
    from near_duplicate_detection_ray.sources.transcripts import synth_corpus
    from near_duplicate_detection_ray.stages.assemble import assemble_conversations
    from near_duplicate_detection_ray.stages.signatures import sign_conversations

    transcripts, _ = synth_corpus(seed=42)
    convs = assemble_conversations(rd.from_arrow(transcripts)).to_pandas()
    base = convs[convs["conv_id"] != "u00000"].reset_index(drop=True)
    extra = convs[convs["conv_id"] == "u00000"].reset_index(drop=True)
    probe_text = extra["doc_text"].iloc[0]

    def sigs_of(df):
        return sign_conversations(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)), NDDConfig()
        )

    idx = NearDupIndex(sigs_of(base), NDDConfig())
    before = {h["conv_id"] for h in idx.query_text(probe_text)}

    added = idx.ingest(sigs_of(extra))
    assert added == 1
    after = {h["conv_id"] for h in idx.query_text(probe_text)}
    assert "u00000" in after and "u00000" not in before

    assert idx.evict(["u00000"]) == 1
    gone = {h["conv_id"] for h in idx.query_text(probe_text)}
    assert "u00000" not in gone
    assert idx.evict(["u00000"]) == 0  # idempotent


def test_interval_join_matches_bruteforce(ray_session):
    """interval_join over random overlapping intervals == pandas brute force,
    for both closed='both' and closed='left'."""
    import pandas as pd
    import ray.data as rd

    from near_duplicate_detection_ray.stages.rangejoin import interval_join

    rng = np.random.default_rng(5)
    n_keys = 6
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, 200),
            "p": rng.integers(0, 100, 200),
            "pid": np.arange(200),
        }
    )
    lo = rng.integers(0, 90, 60)
    ivs = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys + 2, 60),  # some keys have no points
            "lo": lo,
            "hi": lo + rng.integers(0, 40, 60),  # overlapping, variable length
            "iid": np.arange(60),
        }
    )
    for closed in ("both", "left"):
        got = interval_join(
            rd.from_pandas(pts), rd.from_pandas(ivs),
            key=["k"], point_col="p", lo_col="lo", hi_col="hi", closed=closed,
        ).to_pandas()
        merged = pts.merge(ivs, on="k")
        upper = merged["p"] <= merged["hi"] if closed == "both" else merged["p"] < merged["hi"]
        expect = merged[(merged["p"] >= merged["lo"]) & upper]
        assert set(zip(got["pid"], got["iid"])) == set(zip(expect["pid"], expect["iid"])), closed
        assert len(got) == len(expect)


def test_edge_exclusion_oracle_matched(ray_session):
    """M4 knob: shingle edge exclusion active in engine AND oracle -> cluster
    assignments still agree; and the knob changes signatures (sanity)."""
    import pandas as pd
    import ray.data as rd

    from near_duplicate_detection_ray.config import NDDConfig
    from near_duplicate_detection_ray.functions.hashing import apply_edge_exclusion
    from near_duplicate_detection_ray.oracle import oracle_clusters
    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline
    from near_duplicate_detection_ray.sources.transcripts import corpus_docs, synth_corpus

    assert list(apply_edge_exclusion(np.arange(10, dtype=np.uint64), 3)) == list(range(3, 7))
    assert list(apply_edge_exclusion(np.arange(6, dtype=np.uint64), 3)) == list(range(6))
    assert list(apply_edge_exclusion(np.arange(10, dtype=np.uint64), 0)) == list(range(10))

    cfg = NDDConfig(edge_exclude_tokens=3)
    transcripts, _ = synth_corpus(seed=42)
    res = near_dup_pipeline(rd.from_arrow(transcripts), cfg, include_substring=False)
    clusters = res["clusters"].to_pandas().set_index("conv_id")["cluster_id"]
    oc = pd.Series(oracle_clusters(corpus_docs(transcripts), cfg))
    assert (clusters.reindex(oc.index) == oc).all()


def test_boilerplate_strip_oracle_matched(ray_session):
    """M7 knob: engine pipeline with strip_boilerplate=True reproduces the
    oracle clusters computed over driver-side-stripped docs, and the shared
    preamble is actually removed from the boilerplate family."""
    import pandas as pd
    import ray.data as rd

    from near_duplicate_detection_ray.config import NDDConfig
    from near_duplicate_detection_ray.oracle import (
        oracle_clusters,
        oracle_strip_boilerplate,
    )
    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline
    from near_duplicate_detection_ray.sources.transcripts import corpus_docs, synth_corpus

    cfg = NDDConfig(strip_boilerplate=True)
    transcripts, truth = synth_corpus(seed=42)
    res = near_dup_pipeline(rd.from_arrow(transcripts), cfg, include_substring=False)

    convs = res["conversations"].to_pandas().set_index("conv_id")
    docs = corpus_docs(transcripts)
    stripped = oracle_strip_boilerplate(docs, cfg)
    boiler_ids = [
        t for t, fam in zip(truth["conv_id"].to_pylist(), truth["family_id"].to_pylist())
        if fam == "fam_boiler"
    ]
    assert len(boiler_ids) >= cfg.boilerplate_min_count
    for cid in boiler_ids:
        assert convs.loc[cid, "doc_text"] == stripped[cid]
        assert len(stripped[cid]) < len(docs[cid])  # preamble actually removed

    clusters = res["clusters"].to_pandas().set_index("conv_id")["cluster_id"]
    oc = pd.Series(oracle_clusters(stripped, cfg))
    assert (clusters.reindex(oc.index) == oc).all()
    # stripped boilerplate convs no longer form one mega-family
    assert clusters.loc[boiler_ids].nunique() == len(boiler_ids)


def test_checkpoint_empty_stage(ray_session, tmp_path):
    """An empty stage dataset must checkpoint (empty parquet with schema) and
    resume from disk with the same schema."""
    import ray.data as rd

    from near_duplicate_detection_ray.stages.checkpoint import StageCheckpointer

    schema = pa.schema([("a", pa.string()), ("b", pa.string()), ("j", pa.float64())])
    root = str(tmp_path / "ckpt")

    ckpt = StageCheckpointer(root, input_token="empty-test")
    out = ckpt.run_stage(
        "pairs", [], lambda: rd.from_arrow(pa.Table.from_pylist([], schema=schema))
    )
    assert out.count() == 0
    assert ckpt.stages_computed == ["pairs"]

    ckpt2 = StageCheckpointer(root, input_token="empty-test")
    reloaded = ckpt2.run_stage("pairs", [], lambda: pytest.fail("must not recompute"))
    assert ckpt2.stages_skipped == ["pairs"]
    assert reloaded.count() == 0
    assert set(reloaded.schema().names) == {"a", "b", "j"}


def test_dedup_keep_docs_semantics(sparse_docs_dir):
    """Exact copies merge; a 60%-containment pair (jaccard < tau) does NOT —
    dedup_keep components span exact + jaccard edges only."""
    from near_duplicate_detection_ray.pipelines.docs_dedup import dedup_keep_docs

    got = (
        dedup_keep_docs(sparse_docs_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # 10 docs, exactly one exact pair (2 == 3): 9 kept rows
    assert len(got) == 9
    kept = dict(zip(got["doc_id"], got["n_members"]))
    assert kept[2] == 2          # rep of the exact pair
    assert 3 not in kept         # absorbed
    assert kept[0] == 1 and kept[1] == 1  # containment pair NOT merged


def test_batch_jaccard_arrow_zero_copy_matches_blob_path():
    """The Arrow-buffer (zero-copy) kernel must agree with the blob-list
    kernel on every pair, including sliced arrays (nonzero Arrow offset) and
    multi-chunk columns."""
    import pyarrow as pa

    from near_duplicate_detection_ray.functions.similarity import (
        _binary_column_view,
        batch_jaccard_containment,
        batch_jaccard_containment_arrow,
    )

    rng = np.random.default_rng(7)
    sets = []
    for _ in range(60):
        k = int(rng.integers(0, 40))
        sets.append(np.unique(rng.integers(0, 80, size=k).astype(np.uint64)))
    sets[10] = np.empty(0, dtype=np.uint64)
    sets[11] = np.empty(0, dtype=np.uint64)
    pairs = [(i, (i * 7 + 3) % len(sets)) for i in range(len(sets))]
    blobs_a = [sets[i].tobytes() for i, _ in pairs]
    blobs_b = [sets[j].tobytes() for _, j in pairs]
    ref_jac, ref_cont = batch_jaccard_containment(blobs_a, blobs_b)

    col_a = pa.array(blobs_a, pa.large_binary())
    col_b = pa.array(blobs_b, pa.binary())  # exercise the binary->large cast
    jac, cont = batch_jaccard_containment_arrow(col_a, col_b)
    np.testing.assert_array_equal(jac, ref_jac)
    np.testing.assert_array_equal(cont, ref_cont)

    # sliced (nonzero offset) + chunked columns
    sl = slice(5, 41)
    jac_s, cont_s = batch_jaccard_containment_arrow(
        col_a.slice(5, 36),
        pa.chunked_array([col_b.slice(5, 16), col_b.slice(21, 20)]),
    )
    np.testing.assert_array_equal(jac_s, ref_jac[sl])
    np.testing.assert_array_equal(cont_s, ref_cont[sl])

    # the view itself: lengths and concatenated values round-trip
    vals, lens = _binary_column_view(col_a)
    assert lens.tolist() == [len(b) // 8 for b in blobs_a]
    np.testing.assert_array_equal(
        vals, np.frombuffer(b"".join(blobs_a), np.uint64)
    )


def test_docs_as_conversations_matches_scalar_normalize(ray_session, tmp_path):
    """Round-3 verdict item #5: the vectorized docs_as_conversations kernel
    must be bit-identical to the scalar normalize_text on every row —
    including non-ASCII (NFC recomposition, Unicode whitespace) and the odd
    ASCII control whitespace Python's \\s matches but RE2's ASCII \\s does
    not (\\x0b, \\x1c-\\x1f)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from near_duplicate_detection_ray.functions.text import normalize_text
    from near_duplicate_detection_ray.pipelines.docs_dedup import (
        docs_as_conversations,
    )

    texts = [
        "Plain ASCII   with  runs",
        "tabs\tand\nnewlines\r\nmixed",
        "vertical\x0btab and\x1c\x1dseparators\x1f here",
        "  leading and trailing   ",
        "",
        "Café déjà vu",          # combining marks -> NFC
        "nbsp and em-space line",  # Unicode whitespace
        "UPPER lower İstanbul STRASSE ß",
        "emoji \U0001f600 stays",
    ]
    table = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    out = (
        docs_as_conversations(str(tmp_path))
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    for i, raw in enumerate(texts):
        expect = normalize_text(raw)
        assert out["conv_id"][i] == f"{i:012d}"
        assert out["doc_text"][i] == expect, repr(raw)
        assert out["fingerprint"][i] == hashlib.md5(
            expect.encode("utf-8")
        ).hexdigest()
