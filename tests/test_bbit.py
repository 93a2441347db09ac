"""b-bit minwise hashing prefilter: estimator math, packing, recall safety,
selectivity, and output equality with the unfiltered flagship pair join."""

import numpy as np
import pyarrow as pa
import pytest

from near_duplicate_detection_ray.stages.bbit import (
    bbit_estimate,
    bbit_pack_batch,
)


def test_pack_keeps_lowest_bit_in_order():
    mh = np.array(
        [[0, 1, 2, 3, 4, 5, 6, 7], [1, 1, 1, 1, 0, 0, 0, 0]], dtype=np.uint64
    )
    packed = bbit_pack_batch(mh)
    assert packed.shape == (2, 1)
    assert packed[0, 0] == 0b01010101  # lowest bits of 0..7, MSB-first
    assert packed[1, 0] == 0b11110000


def test_estimate_is_unbiased_formula():
    # identical sketches -> J_hat = 1; complementary -> J_hat = -1;
    # half agreement -> J_hat = 0 (the b=1 unbiasing: J = 2c - 1)
    k = 64
    x = np.zeros((3, k // 8), dtype=np.uint8)
    y = np.zeros((3, k // 8), dtype=np.uint8)
    y[1] = 0xFF
    y[2, : k // 16] = 0xFF
    j = bbit_estimate(x, y, k)
    assert j[0] == pytest.approx(1.0)
    assert j[1] == pytest.approx(-1.0)
    assert j[2] == pytest.approx(0.0)


def test_estimate_tracks_true_jaccard_on_real_signatures():
    """Monte-Carlo over the REAL MinHash kernel: the b=1 estimate must sit
    within 4 standard errors of the true Jaccard for sets at several overlap
    levels (pins the estimator against the engine's own signatures)."""
    from near_duplicate_detection_ray.config import NDDConfig
    from near_duplicate_detection_ray.functions.hashing import (
        minhash_batch,
        minhash_params,
    )

    cfg = NDDConfig()
    a_p, b_p = minhash_params(cfg.num_perm, cfg.seed)
    rng = np.random.default_rng(7)
    base = rng.integers(1, 2**63, size=400, dtype=np.uint64)
    other = rng.integers(1, 2**63, size=400, dtype=np.uint64)
    for frac in (1.0, 0.8, 0.5, 0.2):
        n_shared = int(400 * frac)
        s1 = set(base.tolist())
        s2 = set(base[:n_shared].tolist()) | set(other[: 400 - n_shared].tolist())
        true_j = len(s1 & s2) / len(s1 | s2)
        mh = minhash_batch(
            [np.array(sorted(s1), dtype=np.uint64),
             np.array(sorted(s2), dtype=np.uint64)], a_p, b_p
        )
        packed = bbit_pack_batch(mh.astype(np.uint64))
        j_hat = bbit_estimate(packed[:1], packed[1:], cfg.num_perm)[0]
        sd = 1.0 / np.sqrt(cfg.num_perm)
        assert abs(j_hat - true_j) <= 4 * sd, (frac, true_j, j_hat)


def test_prefilter_keeps_all_true_pairs_and_filters_garbage(ray_session):
    """On the synthetic corpus: every exact-verified tau-pair survives the
    prefilter (recall safety at z=6), and the surviving candidate set is a
    strict subset when sub-tau band collisions exist."""
    import ray.data as rd

    from near_duplicate_detection_ray.config import NDDConfig
    from near_duplicate_detection_ray.sources.transcripts import synth_corpus
    from near_duplicate_detection_ray.stages.assemble import (
        assemble_conversations,
    )
    from near_duplicate_detection_ray.stages.bbit import prefilter_candidates
    from near_duplicate_detection_ray.stages.lsh import (
        candidate_pairs,
        explode_bands,
    )
    from near_duplicate_detection_ray.stages.signatures import (
        sign_conversations,
    )
    from near_duplicate_detection_ray.stages.verify import verify_pairs
    from near_duplicate_detection_ray.state.partitioning import (
        materialize_clean,
    )

    transcripts, _ = synth_corpus()
    cfg = NDDConfig()
    sigs = materialize_clean(
        sign_conversations(assemble_conversations(rd.from_arrow(transcripts)), cfg)
    )
    cand = materialize_clean(candidate_pairs(explode_bands(sigs, cfg), cfg))
    kept = materialize_clean(prefilter_candidates(cand, sigs, cfg))
    n_cand, n_kept = cand.count(), kept.count()
    assert n_kept <= n_cand

    def pairset(ds):
        df = ds.to_pandas()
        return {tuple(sorted(p)) for p in zip(df["a"], df["b"])}

    verified_full = verify_pairs(cand, sigs, cfg).to_pandas()
    true_pairs = {
        tuple(sorted(p))
        for p in zip(verified_full["a"], verified_full["b"])
        if True
    }
    # recall safety: every pair the exact verifier confirms (minhash OR
    # substring-candidate containment) that passes on jaccard must survive;
    # check the minhash-confirmed subset explicitly
    mh_pairs = {
        tuple(sorted(p))
        for p, m in zip(
            zip(verified_full["a"], verified_full["b"]), verified_full["method"]
        )
        if m == "minhash"
    }
    assert mh_pairs <= pairset(kept), mh_pairs - pairset(kept)


def test_bbit_query_equals_flagship_pairs(ray_session):
    """near_dup_pairs_bbit output is row-identical to near_dup_pairs_docs —
    in BOTH modes: auto-disengaged (the sub-threshold default at this
    corpus size) and force-engaged (the always-on prefilter path)."""
    from near_duplicate_detection_ray.pipelines.docs_dedup import (
        DOCS_DEDUP_CFG,
        near_dup_pairs_bbit,
        near_dup_pairs_docs,
    )

    sf = "/root/testdata/sf0.001"
    base = (
        near_dup_pairs_docs(sf, DOCS_DEDUP_CFG)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    for kwargs in ({}, {"force": True}, {"engage_above": 0}):
        bbit = (
            near_dup_pairs_bbit(sf, **kwargs)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        assert base.equals(bbit), kwargs


def test_attach_adaptive_width_output_invariant(ray_session):
    """The adaptive verify-attach exchange width is a pure physical choice:
    auto-sized, explicitly narrow and explicitly wide partitioning must all
    produce the identical attached pair set."""
    import ray.data as rd

    from near_duplicate_detection_ray.config import NDDConfig
    from near_duplicate_detection_ray.sources.transcripts import synth_corpus
    from near_duplicate_detection_ray.stages.assemble import (
        assemble_conversations,
    )
    from near_duplicate_detection_ray.stages.lsh import (
        candidate_pairs,
        explode_bands,
    )
    from near_duplicate_detection_ray.stages.signatures import (
        sign_conversations,
    )
    from near_duplicate_detection_ray.stages.verify import verify_pairs
    from near_duplicate_detection_ray.state.partitioning import (
        materialize_clean,
    )

    transcripts, _ = synth_corpus()
    cfg = NDDConfig()
    sigs = materialize_clean(
        sign_conversations(
            assemble_conversations(rd.from_arrow(transcripts)), cfg
        )
    )
    cand = materialize_clean(candidate_pairs(explode_bands(sigs, cfg), cfg))

    def pairset(nparts):
        df = verify_pairs(cand, sigs, cfg, num_partitions=nparts).to_pandas()
        return sorted(zip(df["a"], df["b"], df["method"]))

    # explicit widths stay within the test session's CPU count — a Join
    # wider than the cluster cannot place all its aggregator actors
    auto = pairset(None)
    assert auto == pairset(2)
    assert auto == pairset(4)
