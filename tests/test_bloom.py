"""Bloom-filter semi-join fallback (state/bloom): no false negatives ever,
bounded false positives, and attach_signatures produces IDENTICAL verify
output through the exact-set path and the Bloom path."""

import numpy as np
import pyarrow as pa
import pytest

from near_duplicate_detection_ray.state.bloom import (
    _probe_positions,
    _set_bits,
    _test_bits,
    bits_for,
    hashes_for,
)


def test_sizing():
    m = bits_for(5_000_000, 0.01)
    assert m >= 5_000_000 * 9  # >= ~9.6 bits/key
    assert m & (m - 1) == 0  # power of two
    k = hashes_for(m, 5_000_000)
    assert 1 <= k <= 16


def test_no_false_negatives_and_bounded_fpr():
    ids = np.array([f"conv{i:07d}" for i in range(20_000)], dtype=object)
    n_bits = bits_for(len(ids), 0.01)
    k = hashes_for(n_bits, len(ids))
    words = np.zeros(n_bits >> 6, dtype=np.uint64)
    _set_bits(words, _probe_positions(ids, n_bits, k))
    # membership: every inserted id must test positive
    assert _test_bits(words, _probe_positions(ids, n_bits, k)).all()
    # disjoint probes: FPR near the 1% design point
    other = np.array([f"other{i:07d}" for i in range(20_000)], dtype=object)
    fpr = _test_bits(words, _probe_positions(other, n_bits, k)).mean()
    assert fpr < 0.05


def test_build_bloom_off_driver_and_filter(ray_session):
    import ray.data as rd

    from near_duplicate_detection_ray.state.bloom import bloom_filter, build_bloom

    tbl = pa.table(
        {
            "a": pa.array([f"x{i % 70}" for i in range(400)], pa.string()),
            "b": pa.array([f"y{i % 50}" for i in range(400)], pa.string()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(6)
    words_ref, n_bits, k = build_bloom(ds, ["a", "b"], n_ids=120)
    side = rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array(
                    [f"x{i}" for i in range(70)]
                    + [f"y{i}" for i in range(50)]
                    + [f"z{i}" for i in range(2000)],
                    pa.string(),
                )
            }
        )
    )
    kept = set(
        bloom_filter(side, "conv_id", words_ref, n_bits, k).to_pandas()["conv_id"]
    )
    truth = {f"x{i}" for i in range(70)} | {f"y{i}" for i in range(50)}
    assert truth <= kept, "Bloom must never drop a true endpoint"
    extras = kept - truth
    assert len(extras) < 0.05 * 2000, f"Bloom FPR too high: {len(extras)}/2000"


def _toy_signatures_and_pairs():
    """8 docs with tiny packed shingle sets; 3 candidate pairs."""
    rng = np.random.default_rng(3)
    sigs = {
        "conv_id": [],
        "shingles": [],
        "simhash": [],
    }
    for i in range(8):
        s = np.unique(rng.integers(0, 1000, size=20).astype(np.uint64))
        sigs["conv_id"].append(f"c{i}")
        sigs["shingles"].append(s.tobytes())
        sigs["simhash"].append(int(rng.integers(0, 2**63)))
    sig_tbl = pa.table(
        {
            "conv_id": pa.array(sigs["conv_id"], pa.string()),
            "shingles": pa.array(sigs["shingles"], pa.large_binary()),
            "simhash": pa.array(sigs["simhash"], pa.uint64()),
        }
    )
    pair_tbl = pa.table(
        {
            "a": pa.array(["c0", "c2", "c5"], pa.string()),
            "b": pa.array(["c1", "c3", "c6"], pa.string()),
            "capped": pa.array([False, False, False]),
        }
    )
    return sig_tbl, pair_tbl


def test_attach_signatures_bloom_path_equals_exact(ray_session):
    import ray.data as rd

    from near_duplicate_detection_ray.stages.verify import attach_signatures

    sig_tbl, pair_tbl = _toy_signatures_and_pairs()
    sigs = rd.from_arrow(sig_tbl)
    pairs = rd.from_arrow(pair_tbl)

    def normalize(ds):
        df = ds.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        return df[sorted(df.columns)]

    exact = normalize(attach_signatures(pairs, sigs, num_partitions=2))
    bloom = normalize(
        attach_signatures(
            rd.from_arrow(pair_tbl), rd.from_arrow(sig_tbl),
            num_partitions=2, semi_filter_max_ids=1,  # force the Bloom fallback
        )
    )
    assert exact.equals(bloom)
    assert len(exact) == 3
