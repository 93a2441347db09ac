"""End-to-end: the Ray pipeline's clusters must reproduce the NumPy oracle's
dup-pair labeling with recall >= 0.99 (and precision >= 0.99) on the synthetic
corpus with planted dup families (BASELINE.json north_rule)."""

import numpy as np
import pyarrow as pa
import pytest

from near_duplicate_detection_ray.config import NDDConfig
from near_duplicate_detection_ray.oracle import oracle_clusters, oracle_dup_pairs
from near_duplicate_detection_ray.sources.transcripts import corpus_docs, synth_corpus

CFG = NDDConfig()


@pytest.fixture(scope="module")
def pipeline_result(ray_session):
    import ray.data as rd

    from near_duplicate_detection_ray.pipelines.dedup import near_dup_pipeline

    transcripts, truth = synth_corpus(seed=42)
    ds = rd.from_arrow(transcripts)
    result = near_dup_pipeline(ds, CFG, include_substring=True)
    # ONE to_pandas(): zipping columns from two separate executions of a lazy
    # dataset scrambles the mapping (block order is not stable across
    # executions — the one nondeterminism Ray Data exposes here)
    cl = result["clusters"].to_pandas()
    clusters = dict(zip(cl["conv_id"], cl["cluster_id"]))
    return transcripts, truth, result, clusters


def _pair_metrics(engine_clusters, oracle_pairs):
    """Recall/precision of 'same cluster' vs oracle dup pairs."""
    recalled = sum(
        1 for a, b in oracle_pairs if engine_clusters.get(a) == engine_clusters.get(b)
    )
    recall = recalled / len(oracle_pairs) if oracle_pairs else 1.0
    # precision over engine same-cluster pairs
    from collections import defaultdict

    groups = defaultdict(list)
    for c, label in engine_clusters.items():
        groups[label].append(c)
    engine_pairs = set()
    for members in groups.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                engine_pairs.add((members[i], members[j]))
    if not engine_pairs:
        return recall, 1.0, set()
    # oracle "transitive truth": clusters from oracle pairs
    return recall, None, engine_pairs


def test_cluster_recall_and_precision(pipeline_result):
    transcripts, truth, result, clusters = pipeline_result
    docs = corpus_docs(transcripts)
    assert set(clusters) == set(docs), (
        "every conversation must receive a cluster; "
        f"missing={sorted(set(docs) - set(clusters))[:10]} "
        f"extra={sorted(set(clusters) - set(docs))[:10]}"
    )

    oracle_pairs = oracle_dup_pairs(docs, CFG)
    recalled = sum(1 for a, b in oracle_pairs if clusters[a] == clusters[b])
    recall = recalled / len(oracle_pairs)
    # On failure, dump the misses so a flake leaves an actionable trace
    # (observed once under full-suite load, never reproduced in isolation).
    missed = [(a, b) for a, b in oracle_pairs if clusters[a] != clusters[b]]
    assert recall >= 0.99, (
        f"dup-pair recall {recall:.4f} < 0.99; "
        f"{len(missed)}/{len(oracle_pairs)} oracle pairs split across clusters: "
        f"{missed[:20]} | dup_pairs rows={result['dup_pairs'].count()} "
        f"clusters={len(set(clusters.values()))} convs={len(clusters)}"
    )

    # precision vs oracle TRANSITIVE clusters (engine may legitimately link
    # a-c through b even if (a,c) alone is below tau)
    ocl = oracle_clusters(docs, CFG, include_substring=True)
    from collections import defaultdict

    groups = defaultdict(list)
    for c, label in clusters.items():
        groups[label].append(c)
    engine_pairs = []
    for members in groups.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                engine_pairs.append((members[i], members[j]))
    correct = sum(1 for a, b in engine_pairs if ocl[a] == ocl[b])
    precision = correct / len(engine_pairs) if engine_pairs else 1.0
    wrong = [(a, b) for a, b in engine_pairs if ocl[a] != ocl[b]]
    assert precision >= 0.99, (
        f"same-cluster precision {precision:.4f} < 0.99; "
        f"{len(wrong)} over-merged pairs: {wrong[:20]}"
    )


def test_planted_families_clustered(pipeline_result):
    transcripts, truth, result, clusters = pipeline_result
    kinds = dict(zip(truth["conv_id"].to_pylist(), truth["kind"].to_pylist()))
    fams = dict(zip(truth["conv_id"].to_pylist(), truth["family_id"].to_pylist()))
    # exact copies cluster with their source
    assert clusters["x00000"] == clusters["u00000"]
    # near-edits cluster with their source
    near = [c for c, k in kinds.items() if k == "near-edit"]
    srcs = {c: fams[c].removeprefix("fam_") for c in near}
    joined = sum(1 for c, s in srcs.items() if clusters[c] == clusters[s])
    assert joined / len(near) >= 0.99
    # boilerplate convs form one cluster
    boiler = [c for c, k in kinds.items() if k == "boilerplate-skew"]
    assert len({clusters[c] for c in boiler}) == 1
    # substring containment found by the anchor pass
    subs = [c for c, k in kinds.items() if k == "substring"]
    sub_joined = sum(
        1 for c in subs if clusters[c] == clusters[fams[c].removeprefix("fam_")]
    )
    assert sub_joined / len(subs) >= 0.9
    # degenerate empty/whitespace docs share one fingerprint cluster
    assert clusters["d00000"] == clusters["d00001"]


def test_signature_stage_matches_oracle(pipeline_result):
    """Engine signatures (computed distributed, reps only) must be bit-identical
    to the oracle's for the same conv_ids."""
    from near_duplicate_detection_ray.oracle import oracle_signatures

    transcripts, _, result, _ = pipeline_result
    docs = corpus_docs(transcripts)
    osigs = oracle_signatures(docs, CFG)
    sig_pdf = result["signatures"].to_pandas()
    assert len(sig_pdf) > 0
    for _, row in sig_pdf.iterrows():
        o = osigs[row["conv_id"]]
        assert np.array_equal(np.asarray(row["minhash"], dtype=np.uint64), o["minhash"])
        assert int(row["simhash"]) == o["simhash"]
        assert row["fingerprint"] == o["fingerprint"]


def test_per_turn_text_equality_invariant(pipeline_result, ray_session):
    """input_hint invariant: per-turn text preserved byte-for-byte under stable
    (conv_id, turn_idx) order through a read -> pipeline-adjacent roundtrip."""
    import ray.data as rd

    transcripts, _, _, _ = pipeline_result
    ds = rd.from_arrow(transcripts)
    back = (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    orig = (
        transcripts.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (back["text"] == orig["text"]).all()
    assert (back["conv_id"] == orig["conv_id"]).all()
