"""End-to-end training-data curation over the documents table — the composed
pipeline a user of this engine actually runs: ONE fused pass computes every
text predicate (language vote, token budget, Gopher-style repetition), the
dedup machinery supplies the duplicate-loser set as a broadcast, and the
survivors stream out with their attributes.

Composition shape (the 100-TB story):

- the three text predicates share a single read and a single tokenize —
  fusing them is the point of a curation pass (three separate queries would
  scan the corpus three times);
- duplicate LOSERS (non-representative members of exact ∪ near-dup
  components) are a small set bounded by duplicate mass, built off-driver
  from the shared component labeling (``docs_dedup._dedup_components``) and
  applied as one inverted ``pc.is_in`` — the anti-join discipline, no
  shuffle of the documents table;
- every predicate is individually DuckDB-oracled elsewhere
  (``lang_id_docs``, ``token_counts_docs``, ``repetition_docs``,
  ``dedup_keep_docs``); the composed oracle re-assembles those CTEs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import NDDConfig


def curate_docs(
    sf_dir: str,
    min_tokens: int = 20,
    max_dup_word_frac: float = 0.75,
    lang: str = "en",
    cfg: NDDConfig | None = None,
):
    """Surviving docs with attributes: doc_id, lang_pred, n_tokens,
    dup_word_frac — rows that (a) are their dup-component representative,
    (b) vote ``lang``, (c) have >= ``min_tokens`` tokens, and (d) repeat at
    most ``max_dup_word_frac`` of their word occurrences."""
    import ray

    from ..state.partitioning import distinct_values_ref, key_partitioned
    from .docs_dedup import _dedup_components
    from .text_analysis import _TOKEN_PAT, _lang_pred_arr, _read_docs, _token_row_index

    clusters = _dedup_components(sf_dir, cfg)

    def loser_block(batch: pa.Table) -> pa.Table:
        """One cluster-keyed partition: members that are NOT their
        component's min conv_id, as int64 doc ids."""
        empty = pa.table({"doc_id": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        import pandas as pd

        df = batch.to_pandas().sort_values(["cluster_id", "conv_id"], kind="mergesort")
        rep = df.groupby("cluster_id")["conv_id"].transform("min")
        mask = df["conv_id"] != rep
        if not mask.any():
            return empty
        ids = df.loc[mask, "conv_id"].astype(np.int64).to_numpy()
        return pa.table({"doc_id": pa.array(ids, pa.int64())})

    losers = key_partitioned(clusters, ["cluster_id"]).map_batches(
        loser_block, batch_format="pyarrow", batch_size=None
    )
    losers_ref, _n_losers = distinct_values_ref(losers, ["doc_id"])

    def fused(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "lang_pred": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "dup_word_frac": pa.array([], pa.float64()),
            }
        )
        if n == 0:
            return empty
        text = batch["text"]
        # token budget (same kernel as token_counts_docs)
        n_tokens = pc.cast(
            pc.count_substring_regex(text, pattern=_TOKEN_PAT), pa.int64()
        ).to_numpy(zero_copy_only=False)
        # language vote (shared kernel with lang_id_docs)
        pred = _lang_pred_arr(text, n)
        # dup_word_frac (word-level recipe of repetition_docs)
        blank = pc.equal(pc.utf8_trim_whitespace(text), pa.scalar("")).to_numpy(
            zero_copy_only=False
        )
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), pattern=r"\s+")
        row_idx, lens = _token_row_index(toks, n)
        n_words = np.where(blank, 0, lens)
        flat = pc.list_flatten(toks)
        codes = (
            pc.dictionary_encode(flat)
            .combine_chunks()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
            if len(flat)
            else np.empty(0, np.int64)
        )
        keep_tok = ~blank[row_idx]
        r, c = row_idx[keep_tok], codes[keep_tok]
        order = np.lexsort((c, r))
        rs, cs = r[order], c[order]
        new = np.ones(len(rs), dtype=np.float64)
        if len(rs) > 1:
            new[1:] = (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])
        n_distinct = np.bincount(rs, weights=new, minlength=n)
        nw = n_words.astype(np.float64)
        dup_word = np.where(
            n_words > 0, 1.0 - (n_distinct * 1.0 / np.maximum(nw, 1.0)), 0.0
        )

        loser_ids = ray.get(losers_ref)
        if len(loser_ids) == 0:
            is_loser = np.zeros(n, dtype=bool)
        else:
            is_loser = pc.is_in(batch["doc_id"], value_set=loser_ids).to_numpy(
                zero_copy_only=False
            )
        keep = (
            (~is_loser)
            & (pred == lang)
            & (n_tokens >= min_tokens)
            & (dup_word <= max_dup_word_frac)
        )
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(pred.tolist(), pa.string()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "dup_word_frac": pa.array(dup_word, pa.float64()),
            }
        )
        return out.filter(pa.array(keep))

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fused, batch_format="pyarrow"
    )
