"""Determinism and block-invariance of the bench/driver data derivations."""

import pyarrow as pa
import pytest

from near_duplicate_detection_ray.sources.transcripts import (
    TRANSCRIPTS_SCHEMA,
    make_bench_expander,
)

SF = "/root/testdata/sf0.001"


def _docs_batch():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_bench_expander_deterministic_and_block_invariant():
    batch = _docs_batch().slice(0, 20)
    exp = make_bench_expander(reps=3)
    out1, out2 = exp(batch), exp(batch)
    assert out1.equals(out2)
    assert out1.schema.equals(TRANSCRIPTS_SCHEMA)
    # row-local: splitting the input produces the same union
    parts = pa.concat_tables([exp(batch.slice(0, 7)), exp(batch.slice(7, 13))])
    assert parts.equals(out1)


def test_bench_expander_reps_disjoint_shingles():
    """Cross-rep variants must share NO 5-token shingles (the property that
    keeps sub-tau candidates out of the verify stage — see
    sources/transcripts.make_bench_expander)."""
    from near_duplicate_detection_ray.functions.text import shingle_tokens

    batch = _docs_batch().slice(0, 5)
    out = make_bench_expander(reps=2)(batch).to_pandas()
    for doc in ("doc000000000", "doc000000001"):
        t0 = " ".join(
            out[out.conv_id == f"{doc}r0"].sort_values("turn_idx")["text"]
        ).split()
        t1 = " ".join(
            out[out.conv_id == f"{doc}r1"].sort_values("turn_idx")["text"]
        ).split()
        s0 = set(shingle_tokens(t0, 5))
        s1 = set(shingle_tokens(t1, 5))
        assert not (s0 & s1), f"{doc}: reps share shingles"


def test_embedding_dup_pairs_block_invariant(ray_session):
    """Pair emission (a < b within the block view) must be independent of the
    batch size the corpus streams through."""
    from near_duplicate_detection_ray.pipelines import ann

    base = ann.embedding_dup_pairs(SF)
    small = base.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)

    # re-run with a tiny batch size by monkey-adjusting through map_batches arg
    import ray.data as rd
    import numpy as np
    import ray
    import pyarrow as pa

    emb = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas().sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = mat @ mat.T
    ai, bi = np.nonzero(sims >= 0.4)
    keep = ids[ai] < ids[bi]
    import pandas as pd

    brute = (
        pd.DataFrame({"a": ids[ai][keep], "b": ids[bi][keep]})
        .drop_duplicates()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert small.equals(brute)
