"""Unit tests for the pure-function layer: normalization, tokenization,
shingling, hashing, MinHash/SimHash, band hashes, union-find, similarity."""

import numpy as np
import pytest

from near_duplicate_detection_ray.config import NDDConfig
from near_duplicate_detection_ray.functions.hashing import (
    TokenHasher,
    band_hashes,
    hamming_distance,
    hash_token,
    minhash_batch,
    minhash_params,
    shingle_hashes,
    simhash_batch,
    splitmix64,
)
from near_duplicate_detection_ray.functions.similarity import (
    containment_sorted,
    cosine_topk_block,
    jaccard_sorted,
)
from near_duplicate_detection_ray.functions.text import (
    lang_id,
    normalize_text,
    quality_metrics,
    shingle_tokens,
    token_count,
    tokenize,
)
from near_duplicate_detection_ray.functions.unionfind import UnionFind


def test_normalize_text():
    assert normalize_text("  Hello\t WORLD\n\n x ") == "hello world x"
    assert normalize_text("") == ""
    assert normalize_text("   \t\n ") == ""
    # NFC: e + combining acute == precomposed
    assert normalize_text("é") == normalize_text("é")


def test_tokenize_and_count():
    assert tokenize("a bb ccc") == ["a", "bb", "ccc"]
    assert tokenize("") == []
    assert token_count("  a  b ") == 2
    assert token_count("") == 0


def test_shingle_tokens_boundaries():
    toks = ["a", "b", "c", "d", "e"]
    assert shingle_tokens(toks, 3) == ["a b c", "b c d", "c d e"]
    assert shingle_tokens(["a", "b"], 5) == ["a b"]  # short doc: one shingle
    assert shingle_tokens([], 5) == []


def test_hash_token_stable():
    # Fixed expected value guards against accidental algorithm change.
    assert hash_token("hello") == hash_token("hello")
    assert hash_token("hello") != hash_token("hellp")
    assert 0 <= hash_token("hello") < 2**64


def test_shingle_hashes_match_token_shingles():
    """Hash-domain shingles must be the set image of string shingles."""
    hasher = TokenHasher()
    toks = "the quick brown fox jumps over the lazy dog".split()
    th = hasher.hash_tokens(toks)
    sh = shingle_hashes(th, 3)
    assert len(sh) == len(set(shingle_tokens(toks, 3)))
    assert np.all(sh[:-1] < sh[1:])  # sorted unique
    # identical token windows hash identically regardless of position
    th2 = hasher.hash_tokens(["x", "y"] + toks)
    sh2 = shingle_hashes(th2, 3, unique=False)
    sh1 = shingle_hashes(th, 3, unique=False)
    assert set(sh1.tolist()) <= set(sh2.tolist())


def test_shingle_hashes_short_and_empty():
    hasher = TokenHasher()
    assert len(shingle_hashes(hasher.hash_tokens([]), 5)) == 0
    assert len(shingle_hashes(hasher.hash_tokens(["a"]), 5)) == 1
    assert len(shingle_hashes(hasher.hash_tokens(["a", "b"]), 5)) == 1


def test_splitmix64_vectorized():
    x = np.arange(10, dtype=np.uint64)
    y = splitmix64(x)
    assert len(np.unique(y)) == 10
    assert np.array_equal(splitmix64(x), y)


def test_minhash_identical_sets_equal_signatures():
    a, b = minhash_params(128, seed=7)
    s1 = np.unique(np.random.default_rng(0).integers(0, 2**63, 500).astype(np.uint64))
    s2 = s1.copy()
    s3 = np.unique(np.random.default_rng(1).integers(0, 2**63, 500).astype(np.uint64))
    m = minhash_batch([s1, s2, s3], a, b)
    assert np.array_equal(m[0], m[1])
    assert not np.array_equal(m[0], m[2])


def test_minhash_estimates_jaccard():
    a, b = minhash_params(256, seed=3)
    rng = np.random.default_rng(5)
    base = np.unique(rng.integers(0, 2**63, 2000).astype(np.uint64))
    half = base[: len(base) // 2]
    other = np.unique(rng.integers(0, 2**63, len(base) - len(half)).astype(np.uint64))
    s2 = np.unique(np.concatenate([half, other]))
    true_j = jaccard_sorted(base, s2)
    m = minhash_batch([base, s2], a, b)
    est = (m[0] == m[1]).mean()
    assert abs(est - true_j) < 0.12


def test_minhash_degenerate_sentinel():
    a, b = minhash_params(16, seed=1)
    m = minhash_batch([np.empty(0, dtype=np.uint64)], a, b)
    assert np.all(m[0] == np.uint64(0xFFFFFFFFFFFFFFFF))


def test_minhash_chunking_invariant():
    """Signatures must not depend on the reduceat chunking."""
    a, b = minhash_params(64, seed=2)
    rng = np.random.default_rng(9)
    sets = [
        np.unique(rng.integers(0, 2**63, int(n)).astype(np.uint64))
        for n in rng.integers(1, 400, size=30)
    ]
    m1 = minhash_batch(sets, a, b, chunk_rows=65536)
    m2 = minhash_batch(sets, a, b, chunk_rows=7)
    assert np.array_equal(m1, m2)


def test_simhash_properties():
    rng = np.random.default_rng(11)
    base = np.unique(rng.integers(0, 2**63, 1000).astype(np.uint64))
    near = base[:-20]  # tiny perturbation
    far = np.unique(rng.integers(0, 2**63, 1000).astype(np.uint64))
    sh = simhash_batch([base, near, far, np.empty(0, dtype=np.uint64)])
    d_near = hamming_distance(sh[0:1], sh[1:2])[0]
    d_far = hamming_distance(sh[0:1], sh[2:3])[0]
    assert d_near < d_far
    assert sh[3] == 0


def test_band_hashes_shape_and_determinism():
    a, b = minhash_params(128, seed=4)
    rng = np.random.default_rng(12)
    sets = [np.unique(rng.integers(0, 2**63, 200).astype(np.uint64)) for _ in range(5)]
    m = minhash_batch(sets, a, b)
    bh = band_hashes(m, bands=32, rows_per_band=4, seed=4)
    assert bh.shape == (5, 32)
    assert np.array_equal(bh, band_hashes(m, 32, 4, seed=4))
    assert not np.array_equal(bh, band_hashes(m, 32, 4, seed=5))
    # identical docs share every band; distinct docs share (almost) none
    m2 = minhash_batch([sets[0], sets[0]], a, b)
    bh2 = band_hashes(m2, 32, 4, seed=4)
    assert np.array_equal(bh2[0], bh2[1])


def test_hamming_distance():
    a = np.array([0b1011, 0], dtype=np.uint64)
    b = np.array([0b0010, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    assert hamming_distance(a, b).tolist() == [2, 64]


def test_jaccard_and_containment():
    a = np.array([1, 2, 3, 4], dtype=np.uint64)
    b = np.array([3, 4, 5, 6], dtype=np.uint64)
    assert jaccard_sorted(a, b) == pytest.approx(2 / 6)
    assert containment_sorted(a[:2], a) == 1.0
    assert jaccard_sorted(np.empty(0, np.uint64), np.empty(0, np.uint64)) == 1.0
    assert jaccard_sorted(a, np.empty(0, np.uint64)) == 0.0


def test_cosine_topk_block():
    corpus = np.array([[1, 0], [0, 1], [1, 1], [-1, 0]], dtype=np.float64)
    q = np.array([[2, 0]], dtype=np.float64)
    scores, idx = cosine_topk_block(q, corpus, k=3)
    assert idx[0].tolist() == [0, 2, 1]
    assert scores[0][0] == pytest.approx(1.0)


def test_union_find():
    uf = UnionFind()
    for x in "abcdef":
        uf.find(x)
    uf.union("a", "b")
    uf.union("b", "c")
    uf.union("e", "f")
    comp = uf.components()
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["d"] == "d"
    assert comp["e"] == comp["f"] == "e"


def test_quality_metrics_and_lang():
    m = quality_metrics("Hello, world! 123")
    assert m["n_tokens"] == 3.0
    assert m["digit_ratio"] > 0
    assert m["punct_ratio"] > 0
    assert quality_metrics("")["stopword_ratio"] == 0.0
    assert lang_id("the cat and the dog went to the store") == "en"
    assert lang_id("der hund und die katze ist nicht da") == "de"
    assert lang_id("zzz qqq xxx") == "unknown"
    assert lang_id("") == "unknown"


def test_config_hash_changes_with_params():
    c1 = NDDConfig()
    c2 = NDDConfig(tau=0.9)
    assert c1.config_hash() != c2.config_hash()
    assert c1.config_hash() == NDDConfig().config_hash()
    with pytest.raises(ValueError):
        NDDConfig(bands=10, rows_per_band=10, num_perm=128)
