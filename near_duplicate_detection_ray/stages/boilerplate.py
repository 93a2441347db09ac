"""Boilerplate-preamble strip (SURVEY §2 M7 — the text analogue of the
reference's letterbox trim, ``ndd/utils.py:21-33``: remove the constant region
so signatures describe the content, not the frame).

Shared tool/system preambles make unrelated conversations collide in LSH
buckets (the hot-bucket driver — SURVEY §4 skew).  Bucket capping bounds the
damage but leaves the preamble polluting signatures; this stage REMOVES it:

1. fingerprint each conversation's first ``boilerplate_prefix_tokens`` tokens;
2. ONE keyed hash-partition on that prefix fingerprint co-locates each prefix
   group; groups with >= ``boilerplate_min_count`` members are "hot";
3. the group's true shared preamble is its token-level longest common prefix
   (computed from the lexicographic min/max members only — their LCP is the
   whole group's), capped so no member drops below
   ``boilerplate_residual_tokens`` tokens;
4. hot members get the preamble removed and their doc_text / n_tokens /
   fingerprint recomputed; everything else passes through untouched.

Deterministic (group membership and LCP don't depend on block layout) and
mirrored driver-side by ``oracle.oracle_strip_boilerplate`` for the
oracle-matched test.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from ..config import NDDConfig
from ..state.partitioning import key_partitioned
from .assemble import CONVERSATIONS_SCHEMA


def strip_tokens(tokens: list[str], lcp: int, residual: int) -> list[str]:
    """Drop the first ``lcp`` tokens but never below ``residual`` remaining."""
    cut = min(lcp, max(0, len(tokens) - residual))
    return tokens[cut:]


def token_lcp(a: list[str], b: list[str]) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


def _prefix_fp(text: str, k: int) -> str:
    toks = text.split(" ") if text else []
    return hashlib.md5(" ".join(toks[:k]).encode("utf-8")).hexdigest()


def strip_boilerplate(conversations, cfg: NDDConfig | None = None,
                      num_partitions: int | None = None):
    """conversations -> conversations with hot shared preambles removed.
    Input/output schema: stages/assemble.CONVERSATIONS_SCHEMA."""
    cfg = cfg or NDDConfig()
    k = cfg.boilerplate_prefix_tokens
    min_count = cfg.boilerplate_min_count
    residual = cfg.boilerplate_residual_tokens

    def add_prefix_fp(t: pa.Table) -> pa.Table:
        fps = [_prefix_fp(d, k) for d in t["doc_text"].to_pylist()]
        return t.append_column("prefix_fp", pa.array(fps, pa.string()))

    tagged = conversations.map_batches(add_prefix_fp, batch_format="pyarrow")

    def strip_block(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=CONVERSATIONS_SCHEMA)
        out_rows = []
        for _, grp in df.groupby("prefix_fp", sort=False):
            texts = grp["doc_text"].tolist()
            if len(grp) < min_count or not texts[0]:
                out_rows.append(grp)
                continue
            # LCP of the whole group == LCP of its lexicographic min and max
            lo, hi = min(texts), max(texts)
            lcp = token_lcp(lo.split(" "), hi.split(" "))
            if lcp == 0:
                out_rows.append(grp)
                continue
            stripped = [
                " ".join(strip_tokens(t.split(" ") if t else [], lcp, residual))
                for t in texts
            ]
            g = grp.copy()
            g["doc_text"] = stripped
            g["n_tokens"] = [len(t.split(" ")) if t else 0 for t in stripped]
            g["fingerprint"] = [
                hashlib.md5(t.encode("utf-8")).hexdigest() for t in stripped
            ]
            out_rows.append(g)
        merged = pd.concat(out_rows)[
            ["conv_id", "doc_text", "n_turns", "n_tokens", "fingerprint"]
        ]
        return pa.Table.from_pandas(
            merged, schema=CONVERSATIONS_SCHEMA, preserve_index=False
        )

    return key_partitioned(tagged, ["prefix_fp"], num_partitions).map_batches(
        strip_block, batch_format="pandas", batch_size=None
    )
