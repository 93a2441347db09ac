"""Pipeline configuration and lineage hashing.

Mirrors the reference's parameter-lineage semantics: every stage's ``.done``
version string chains its own parameters with all upstream parameters
(``ndd/extract_features.py:74-88``, ``ndd/extract_images.py:164-180``).  Here a
single frozen config object is shared by every stage and the oracle; its hash is
the lineage key for stage checkpoints (see ``stages/checkpoint.py``).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class NDDConfig:
    """Shared config for shingling / signatures / LSH / verification.

    Defaults follow FIXTURES.md §F3 except ``bands``/``rows_per_band``:
    32 bands x 4 rows is required to hit dup-pair recall >= 0.99 at
    ``tau`` = 0.8 (P[miss at j=0.8] = (1 - 0.8^4)^32 ~ 4.6e-8, versus
    ~5.3e-2 for 16x8).  Candidate false positives are filtered by exact
    Jaccard verification, so the extra candidates cost compute, not
    correctness.
    """

    shingle_w: int = 5            # token-level shingle width
    num_perm: int = 128           # MinHash permutations
    bands: int = 32               # LSH bands
    rows_per_band: int = 4        # rows per band (bands * rows_per_band == num_perm)
    tau: float = 0.8              # exact-Jaccard duplicate threshold
    simhash_bits: int = 64
    hamming_radius: int = 3       # SimHash Hamming confirm radius
    min_tokens: int = 1           # fewer normalized tokens => degenerate doc
    seed: int = 42
    bucket_cap: int = 2000        # max members of one LSH bucket before capping
    anchor_mod: int = 8           # substring pass: keep shingles with hash % anchor_mod == 0
    containment_tau: float = 0.9  # shingle containment threshold for substring dups
    # M4 analogue (shot-edge frame exclusion, reference extract_images.py:39-41):
    # drop the first/last N tokens before shingling; 0 = off (shingles over the
    # full token sequence, the oracle-checked default)
    edge_exclude_tokens: int = 0
    # M7 analogue (letterbox trim, reference utils.py:21-33): strip shared
    # boilerplate preambles before signing (see stages/boilerplate.py)
    strip_boilerplate: bool = False
    boilerplate_prefix_tokens: int = 16   # prefix-fingerprint width for grouping
    boilerplate_min_count: int = 8        # group size at which a preamble is "hot"
    boilerplate_residual_tokens: int = 5  # never strip a doc below this many tokens

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands ({self.bands}) * rows_per_band ({self.rows_per_band}) "
                f"must equal num_perm ({self.num_perm})"
            )

    def config_hash(self) -> str:
        """Stable lineage hash of every parameter (reference: ``.done`` string
        equality gate, ``ndd/extract_features.py:88``)."""
        payload = json.dumps(asdict(self), sort_keys=True)
        return hashlib.md5(payload.encode()).hexdigest()


DEFAULT_CONFIG = NDDConfig()
