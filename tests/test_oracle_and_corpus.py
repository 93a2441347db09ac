"""Tests for the synthetic corpus generator and the NumPy oracle."""

import numpy as np
import pyarrow as pa

from near_duplicate_detection_ray.config import NDDConfig
from near_duplicate_detection_ray.oracle import (
    oracle_clusters,
    oracle_docs,
    oracle_dup_pairs,
    oracle_signatures,
    oracle_substring_pairs,
)
from near_duplicate_detection_ray.sources.transcripts import (
    TRANSCRIPTS_SCHEMA,
    corpus_docs,
    docs_to_transcript_batch,
    synth_corpus,
)

CFG = NDDConfig()


def test_synth_corpus_deterministic_and_schema():
    t1, truth1 = synth_corpus(seed=42)
    t2, truth2 = synth_corpus(seed=42)
    assert t1.equals(t2)
    assert truth1.equals(truth2)
    assert t1.schema.equals(TRANSCRIPTS_SCHEMA)
    kinds = set(truth1["kind"].to_pylist())
    assert kinds == {
        "unique", "exact", "near-edit", "turn-shuffled",
        "substring", "boilerplate-skew", "degenerate",
    }


def test_corpus_docs_assembly():
    t, _ = synth_corpus(seed=42)
    docs = corpus_docs(t)
    # every conv_id present; exact copies assemble to identical text
    assert len(docs) == len(set(t["conv_id"].to_pylist()))
    assert docs["x00000"] == docs["u00000"]


def test_oracle_dup_pairs_families():
    t, truth = synth_corpus(seed=42)
    docs = corpus_docs(t)
    pairs = oracle_dup_pairs(docs, CFG)
    # exact copies are dup pairs
    assert ("u00000", "x00000") in pairs
    # near-edit copies (2% edits) exceed tau=0.8
    assert any(a.startswith("n") or b.startswith("n") for a, b in pairs)
    # boilerplate convs share a big preamble -> many pairs among b*
    bpairs = [p for p in pairs if p[0].startswith("b") and p[1].startswith("b")]
    assert len(bpairs) > 50
    # unique convs don't pair with each other
    assert not any(a.startswith("u") and b.startswith("u") for a, b in pairs)


def test_oracle_clusters_transitive():
    t, _ = synth_corpus(seed=42)
    docs = corpus_docs(t)
    clusters = oracle_clusters(docs, CFG)
    assert set(clusters) == set(docs)
    assert clusters["u00000"] == clusters["x00000"]
    # all boilerplate convs in one cluster
    blabels = {clusters[c] for c in docs if c.startswith("b")}
    assert len(blabels) == 1
    # empty and whitespace-only docs share a fingerprint cluster
    assert clusters["d00000"] == clusters["d00001"]


def test_oracle_substring_pairs():
    t, _ = synth_corpus(seed=42)
    docs = corpus_docs(t)
    subs = oracle_substring_pairs(docs, CFG)
    assert ("c00000", "u00003") in subs  # c-convs embed u-convs (s*7+3 pattern)


def test_oracle_signatures_shapes():
    t, _ = synth_corpus(seed=42)
    docs = corpus_docs(t)
    sigs = oracle_signatures(docs, CFG)
    any_sig = next(iter(sigs.values()))
    assert any_sig["minhash"].shape == (CFG.num_perm,)
    # exact dup docs share full signature
    assert np.array_equal(sigs["u00000"]["minhash"], sigs["x00000"]["minhash"])
    assert sigs["u00000"]["fingerprint"] == sigs["x00000"]["fingerprint"]


def test_docs_to_transcript_batch_rowlocal():
    batch = pa.table(
        {
            "doc_id": pa.array([3, 7, 12], pa.int64()),
            "text": pa.array(
                ["alpha beta " * 40, "gamma delta " * 40, "epsilon zeta " * 10], pa.string()
            ),
        }
    )
    out = docs_to_transcript_batch(batch)
    assert out.schema.equals(TRANSCRIPTS_SCHEMA)
    cids = set(out["conv_id"].to_pylist())
    assert "doc000000003" in cids and "doc000000003m" in cids  # near-dup planted
    assert "doc000000007" in cids and "doc000000007e" in cids  # exact dup planted
    assert "doc000000012" in cids and "doc000000012e" not in cids
    # splitting the batch row-wise yields identical union (block invariance)
    o1 = docs_to_transcript_batch(batch.slice(0, 1))
    o2 = docs_to_transcript_batch(batch.slice(1, 2))
    assert pa.concat_tables([o1, o2]).equals(out)
