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


def _gram_windows(texts, n: int):
    """All word n-gram strings of each text (single-space split) plus the
    per-gram doc index.  Fully vectorized IN ARROW: one split, then ONE
    ``binary_join_element_wise`` over the n shifted zero-copy slices of the
    flat token array (no Python str objects anywhere — the old object-array
    concatenation was the last Python-level loop on the decontamination
    path).  Returns (pa.StringArray, np.int64 doc indices).  Mirrors the
    SQL ``array_to_string(ws[i:i+n-1], ' ')`` windows exactly (docs with
    fewer than n tokens contribute nothing)."""
    toks = pc.split_pattern(texts, pattern=" ")
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    counts = np.diff(offsets)
    L = len(flat)
    if L == 0 or L < n:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    m = L - n + 1
    g = pc.binary_join_element_wise(*[flat.slice(k, m) for k in range(n)], " ")
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    doc_end = offsets[1:][doc_of]
    pos = np.arange(L, dtype=np.int64)
    valid = (pos + n - 1 < doc_end)[:m]
    return g.filter(pa.array(valid)), doc_of[:m][valid]


def _eval_split_mask(ids: np.ndarray, pct: int) -> np.ndarray:
    """Deterministic content-independent eval split: md5_low64(id) % 100 < pct."""
    from ..functions.hashing import md5_low64

    return np.fromiter(
        (md5_low64(str(int(d))) % 100 < pct for d in ids), bool, len(ids)
    )


def _eval_gram_batch(n: int, pct: int):
    """Batch fn shared by every decontamination flavor: per-block UNIQUE
    word n-gram strings of the EVAL split.  One definition keeps the exact
    and Bloom paths' gram derivations bit-identical (their output-identity
    guarantee depends on it)."""
    def eval_grams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(_eval_split_mask(ids, pct)))
        if t.num_rows == 0:
            return pa.table({"gram": pa.array([], pa.string())})
        g, _ = _gram_windows(t["text"].combine_chunks(), n)
        return pa.table({"gram": pc.unique(g)})

    return eval_grams


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


def decontaminate_docs(sf_dir: str, n: int = 8, pct: int = 10):
    """Benchmark DECONTAMINATION — the cross-corpus exact-n-gram dedup every
    large training-data pipeline runs before training (drop training docs
    sharing any word ``n``-gram with a held-out eval set):

    1. the eval split is the deterministic content-independent hash split
       (``md5_low64(doc_id) % 100 < pct`` — same rule as ``sample_docs``);
    2. the eval side's distinct n-gram STRING set is built OFF-DRIVER
       (per-block grams -> remote tree dedup, ``distinct_values_ref``) and
       broadcast once via the object store — it is bounded by eval-set size,
       not corpus size (at extreme eval sizes the upgrade path is 64-bit
       gram hashes + the Bloom semi-join in ``state/bloom``, trading SQL
       exactness for memory);
    3. ONE streamed pass over the training side computes each doc's grams
       vectorized (single-space split + 8-way shifted object-array concat —
       no per-doc Python) and drops docs with any gram hit via ``pc.is_in``
       + a per-doc segmented any().

    No shuffle touches the training corpus.  Emits surviving train docs
    (doc_id, n_chars).  Gram construction (single-space split, <n-token
    docs contribute nothing) mirrors the SQL oracle's
    ``string_split``/``array_to_string`` exactly — string grams, not
    hashes, so the match is collision-free."""
    import ray

    from ..state.partitioning import distinct_values_ref
    from ..sources.io import read_parquet_clean

    def _read(columns):
        return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)

    def _gram_strings(texts: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
        return _gram_windows(texts, n)

    def _is_eval(ids: np.ndarray) -> np.ndarray:
        return _eval_split_mask(ids, pct)

    eval_grams = _eval_gram_batch(n, pct)

    grams_ds = _read(["doc_id", "text"]).map_batches(eval_grams, batch_format="pyarrow")
    eval_ref, n_eval = distinct_values_ref(grams_ds, ["gram"])

    def keep_clean(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(~_is_eval(ids)))
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_chars": pa.array([], pa.int64())}
            )
        g, doc_of = _gram_strings(t["text"].combine_chunks())
        contaminated = np.zeros(t.num_rows, bool)
        if len(g):
            hits = pc.is_in(
                g, value_set=ray.get(eval_ref)
            ).to_numpy(zero_copy_only=False)
            np.logical_or.at(contaminated, doc_of[hits], True)
        out = t.filter(pa.array(~contaminated))
        return pa.table(
            {"doc_id": out["doc_id"], "n_chars": out["n_chars"]}
        )

    return _read(["doc_id", "text", "n_chars"]).map_batches(
        keep_clean, batch_format="pyarrow"
    )


def contamination_report(sf_dir: str, n: int = 8, pct: int = 10):
    """Contamination SEVERITY report — the graded companion to the binary
    :func:`decontaminate_docs` drop: for every train-side doc with at least
    one word ``n``-gram window, how many of its windows appear in the eval
    split's distinct-gram set, and the fraction.

    Same scale shape as decontaminate: the eval gram set is built off-driver
    and broadcast once; ONE streamed pass over the train side computes all
    windows vectorized and reduces per doc with two ``np.bincount`` calls —
    no shuffle of the corpus.  Output: (doc_id, n_grams, n_hits,
    contamination_frac), the float being the identical hits/total IEEE
    division on both engines."""
    import ray

    from ..sources.io import read_parquet_clean
    from ..state.partitioning import distinct_values_ref

    def _read(columns):
        return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)

    eval_grams = _eval_gram_batch(n, pct)

    grams_ds = _read(["doc_id", "text"]).map_batches(eval_grams, batch_format="pyarrow")
    eval_ref, _ = distinct_values_ref(grams_ds, ["gram"])

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_grams", pa.int64()),
         ("n_hits", pa.int64()), ("contamination_frac", pa.float64())]
    )

    def report(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(~_eval_split_mask(ids, pct)))
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        g, doc_of = _gram_windows(t["text"].combine_chunks(), n)
        totals = np.bincount(doc_of, minlength=t.num_rows).astype(np.int64)
        hits_per_doc = np.zeros(t.num_rows, np.int64)
        if len(g):
            hits = pc.is_in(
                g, value_set=ray.get(eval_ref)
            ).to_numpy(zero_copy_only=False)
            hits_per_doc = np.bincount(
                doc_of, weights=hits.astype(np.float64), minlength=t.num_rows
            ).astype(np.int64)
        keep = totals > 0
        return pa.table(
            {
                "doc_id": pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
                "n_grams": pa.array(totals[keep], pa.int64()),
                "n_hits": pa.array(hits_per_doc[keep], pa.int64()),
                "contamination_frac": pa.array(
                    hits_per_doc[keep] / totals[keep], pa.float64()),
            },
            schema=out_schema,
        )

    return _read(["doc_id", "text"]).map_batches(report, batch_format="pyarrow")


def prepare_training_docs(sf_dir: str, min_out_tokens: int = 10,
                          cfg: NDDConfig | None = None):
    """The full corpus-preparation composition — what a user actually ships
    to a tokenizer: :func:`curate_docs` survivors (dedup representative,
    language vote, token budget, repetition cap) with their corpus-duplicated
    spans CUT (``docs_dedup.cut_spans_docs``), re-filtered to
    ``min_out_tokens`` post-cut tokens.

    Composition stays distributed: the survivor id set is built off-driver
    (``distinct_values_ref`` over the curate output) and applied to the
    span-cut stream as one broadcast ``pc.is_in``; the post-cut length
    filter is a vectorized count on the already-clean text.  Output:
    ``doc_id, text_out, n_tokens`` — every stage individually SQL-verified,
    and the composition oracled end-to-end."""
    import ray

    from ..state.partitioning import distinct_values_ref
    from .docs_dedup import cut_spans_docs
    from .text_analysis import _TOKEN_PAT

    survivors_ref, _n = distinct_values_ref(
        curate_docs(sf_dir, cfg=cfg), ["doc_id"]
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.is_in(batch["doc_id"], value_set=ray.get(survivors_ref))
        )
        n_tok = pc.cast(
            pc.count_substring_regex(t["kept_text"], pattern=_TOKEN_PAT), pa.int64()
        )
        t = pa.table(
            {"doc_id": t["doc_id"], "text_out": t["kept_text"], "n_tokens": n_tok}
        )
        return t.filter(pc.greater_equal(t["n_tokens"], pa.scalar(min_out_tokens)))

    return cut_spans_docs(sf_dir).map_batches(finish, batch_format="pyarrow")


def decontaminate_docs_bloom(sf_dir: str, n: int = 8, pct: int = 10,
                             fp_rate: float = 0.01,
                             num_partitions: int | None = None):
    """BLOOM-SCREENED decontamination — the documented scale path of
    :func:`decontaminate_docs` for eval-gram sets too large to broadcast as
    an exact value_set:

    1. the eval gram stream feeds a fixed-size distributed Bloom filter
       (``state/bloom.build_bloom`` — off-driver partial bit arrays, remote
       tree OR-merge; 8 MiB at 5M grams / 1% FPR regardless of string bytes);
    2. the train pass probes the filter vectorized and emits only CANDIDATE
       (doc_id, gram) hits — true hits plus ~fp_rate of gram volume;
    3. an exact inner join of the candidates against the (globally
       deduplicated, keyed-shuffled) eval grams confirms every hit, so false
       positives are dropped and the output is IDENTICAL to the exact path —
       the same DuckDB oracle gates both (`tests/test_bloom_decontaminate.py`
       additionally pins engine==engine equality).

    The join shuffles only candidates + eval grams, never the train corpus;
    the contaminated-doc id set (bounded by true contamination) broadcasts
    for the final anti-filter pass."""
    import ray

    from ..sources.io import read_parquet_clean
    from ..state.bloom import bloom_filter as _bf  # noqa: F401 (family ref)
    from ..state.bloom import _probe_positions, _test_bits, build_bloom
    from ..state.partitioning import (
        default_partitions,
        distinct_values_ref,
        key_partitioned,
        materialize_clean,
    )

    def _read(columns):
        return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)

    eval_grams = _eval_gram_batch(n, pct)

    grams_ds = materialize_clean(
        _read(["doc_id", "text"]).map_batches(eval_grams, batch_format="pyarrow")
    )
    n_est = grams_ds.count()  # upper bound (per-block-unique rows)

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64())])

    def all_clean(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(~_eval_split_mask(ids, pct)))
        return pa.table(
            {"doc_id": t["doc_id"], "n_chars": t["n_chars"]}, schema=out_schema
        )

    if n_est == 0:
        return _read(["doc_id", "n_chars"]).map_batches(
            all_clean, batch_format="pyarrow"
        )

    words_ref, n_bits, k = build_bloom(grams_ds, ["gram"], n_est, fp_rate)

    def candidates(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "gram": pa.array([], pa.string())}
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(~_eval_split_mask(ids, pct)))
        if t.num_rows == 0:
            return empty
        g, doc_of = _gram_windows(t["text"].combine_chunks(), n)
        if not len(g):
            return empty
        words = ray.get(words_ref)
        mask = _test_bits(
            words,
            _probe_positions(g.to_numpy(zero_copy_only=False), n_bits, k),
        )
        if not mask.any():
            return empty
        d_ids = t["doc_id"].to_numpy(zero_copy_only=False)[doc_of[mask]]
        return pa.table(
            {
                "doc_id": pa.array(d_ids, pa.int64()),
                "gram": g.filter(pa.array(mask)),
            }
        )

    cand = materialize_clean(
        _read(["doc_id", "text"]).map_batches(candidates, batch_format="pyarrow")
    )

    def block_distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"gram": pa.array([], pa.string())})
        return pa.table({"gram": pc.unique(t["gram"].combine_chunks())})

    parts = num_partitions or default_partitions()
    eval_distinct = materialize_clean(
        key_partitioned(grams_ds, ["gram"], parts).map_batches(
            block_distinct, batch_format="pyarrow", batch_size=None
        )
    )
    confirmed = cand.join(
        eval_distinct,
        join_type="inner",
        num_partitions=parts,
        on=("gram",),
        right_suffix="_e",
    )
    ids_ref, n_bad = distinct_values_ref(
        confirmed.select_columns(["doc_id"]), ["doc_id"]
    )

    def strip_bad(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(~_eval_split_mask(ids, pct)))
        if n_bad and t.num_rows:
            bad = pc.is_in(t["doc_id"], value_set=ray.get(ids_ref))
            t = t.filter(pc.invert(bad))
        return pa.table(
            {"doc_id": t["doc_id"], "n_chars": t["n_chars"]}, schema=out_schema
        )

    return _read(["doc_id", "n_chars"]).map_batches(
        strip_bad, batch_format="pyarrow"
    )


def decontaminate_docs_fuzzy(sf_dir: str, pct: int = 10, tau: float | None = None):
    """FUZZY benchmark decontamination — the MinHash/LSH analogue of
    :func:`decontaminate_docs`: drop training docs whose exact token-shingle
    Jaccard against ANY eval-split doc reaches the near-dup threshold
    (catching paraphrase-level leakage that exact n-gram matching misses;
    cf. the cross-split fuzzy dedup step of large pretraining pipelines).

    Reuses the flagship machinery end-to-end (sign -> band explode -> bucket
    shuffle -> exact-Jaccard verify; bands=32 x rows=4 miss probability at
    j >= 0.8 is < 5e-8, the same guarantee the SQL-checked
    ``near_dup_pairs_docs`` rides).  Only CROSS-SPLIT pairs mark
    contamination; the contaminated-train id set is deduplicated OFF-DRIVER
    (``distinct_values_ref``) and broadcast for one anti-filter pass over
    the train split.  Output: surviving train docs ``doc_id, n_chars`` —
    same contract as the exact path.
    """
    import ray

    from ..state.partitioning import distinct_values_ref, materialize_clean
    from ..stages.lsh import candidate_pairs, explode_bands
    from ..stages.signatures import sign_conversations
    from ..stages.verify import verify_pairs
    from .docs_dedup import DOCS_DEDUP_CFG, docs_as_conversations

    import dataclasses

    cfg = DOCS_DEDUP_CFG if tau is None else dataclasses.replace(
        DOCS_DEDUP_CFG, tau=tau
    )
    convs = docs_as_conversations(sf_dir)
    sigs = materialize_clean(sign_conversations(convs, cfg))
    cand = candidate_pairs(explode_bands(sigs, cfg), cfg)
    dup = verify_pairs(cand, sigs, cfg).map_batches(
        lambda t: t.filter(pc.equal(t["method"], "minhash")), batch_format="pyarrow"
    )

    def cross_split_train_ids(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        a = pc.cast(t["a"], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t["b"], pa.int64()).to_numpy(zero_copy_only=False)
        ea, eb = _eval_split_mask(a, pct), _eval_split_mask(b, pct)
        # train endpoint of each eval<->train pair
        cont = np.concatenate([a[~ea & eb], b[ea & ~eb]])
        return pa.table({"doc_id": pa.array(np.unique(cont), pa.int64())})

    cont_ds = dup.map_batches(cross_split_train_ids, batch_format="pyarrow")
    cont_ref, _n_cont = distinct_values_ref(cont_ds, ["doc_id"])

    def _read(columns):
        from ..sources.io import read_parquet_clean

        return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)

    def keep_clean(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(~_eval_split_mask(ids, pct)))
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "n_chars": pa.array([], pa.int64())}
            )
        cont = ray.get(cont_ref)
        if cont is not None and len(cont):
            t = t.filter(
                pc.invert(pc.is_in(pc.cast(t["doc_id"], pa.int64()), value_set=cont))
            )
        return pa.table({"doc_id": t["doc_id"], "n_chars": t["n_chars"]})

    return _read(["doc_id", "n_chars"]).map_batches(keep_clean, batch_format="pyarrow")


def upsert_docs(sf_dir: str, upd_pct: int = 20, ins_pct: int = 5):
    """MERGE / UPSERT (last-writer-wins) — the table-maintenance primitive of
    an incremental corpus store (reference analogue: ``update_index``'s
    refresh-changed + add-new semantics, ``ndd/server_ndd.py:227-257``).

    The change set is derived deterministically from the corpus itself so
    the SQL oracle can replay it exactly: docs in the ``upd_pct`` hash
    bucket get an updated body (version 1), and a disjoint ``ins_pct``
    bucket yields brand-new NEGATIVE ids (-(id+1), disjoint from every
    non-negative base id).  The merge is ONE
    doc_id-keyed hash partition over base ∪ changes with a vectorized
    max-version-wins pick per id — no driver set, no join; at 100 TB the
    changes stream through the same shuffle as the base.

    Output: ``doc_id, version (0 kept / 1 upserted), n_chars`` of the
    winning row."""
    import pandas as pd

    from ..sources.io import read_parquet_clean
    from ..state.partitioning import key_partitioned

    def _read(columns):
        return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)

    from ..functions.hashing import md5_low64

    def base_and_change_rows(batch: pa.Table) -> pa.Table:
        """ONE text scan emits the base rows and this batch's derived change
        rows together (review fix: two independent pipelines read and
        decoded the text column twice)."""
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        base_chars = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
        bucket = np.fromiter(
            (md5_low64(str(int(d))) % 100 for d in ids), np.int64, len(ids)
        )
        upd_mask = bucket < upd_pct
        upd_ids = ids[upd_mask]
        upd_chars = base_chars.to_numpy(zero_copy_only=False)[upd_mask] + len(
            " UPDATED"
        )
        # inserted ids are NEGATIVE (-(id+1)) — provably disjoint from any
        # non-negative base/update id, so no change row can collide with
        # another (review fix: +10M offsets could collide at large id
        # ranges, making the winner nondeterministic vs the oracle)
        ins_ids = -(ids[bucket < ins_pct] + 1)
        ins_chars = np.array(
            [len(f"NEW DOC {i}") for i in ins_ids], dtype=np.int64
        )
        n_change = len(upd_ids) + len(ins_ids)
        return pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [
                        pc.cast(batch["doc_id"], pa.int64()).combine_chunks(),
                        pa.array(upd_ids, pa.int64()),
                        pa.array(ins_ids, pa.int64()),
                    ]
                ),
                "version": pa.array(
                    np.concatenate(
                        [np.zeros(batch.num_rows, np.int64),
                         np.ones(n_change, np.int64)]
                    )
                ),
                "n_chars": pa.concat_arrays(
                    [
                        base_chars.combine_chunks(),
                        pa.array(upd_chars, pa.int64()),
                        pa.array(ins_chars, pa.int64()),
                    ]
                ),
            }
        )

    merged_in = _read(["doc_id", "text"]).map_batches(
        base_and_change_rows, batch_format="pyarrow"
    )

    def pick_winner(df: "pd.DataFrame") -> pa.Table:
        schema = pa.schema(
            [("doc_id", pa.int64()), ("version", pa.int64()),
             ("n_chars", pa.int64())]
        )
        if df.empty:
            return schema.empty_table()
        df = df.sort_values(["doc_id", "version"], kind="mergesort")
        win = df.groupby("doc_id", sort=False).tail(1)
        return pa.table(
            {
                "doc_id": pa.array(win["doc_id"].to_numpy(), pa.int64()),
                "version": pa.array(win["version"].to_numpy(), pa.int64()),
                "n_chars": pa.array(win["n_chars"].to_numpy(), pa.int64()),
            },
            schema=schema,
        )

    return key_partitioned(merged_in, ["doc_id"]).map_batches(
        pick_winner, batch_format="pandas", batch_size=None
    )


def table_diff(ds_a, ds_b, key: str, value_col: str,
               num_partitions: int | None = None):
    """GENERIC TABLE DIFF (data versioning): classify every key across two
    dataset versions as ``added`` (only in B), ``removed`` (only in A),
    ``changed`` (both, ``value_col`` differs) or ``unchanged`` — the audit
    an incremental store runs after a merge/compaction to prove what
    actually moved.

    Both sides are tagged and UNIONED through one ``key``-keyed hash
    partition (the diff of 100-TB tables costs exactly one co-shuffle);
    the block kernel lexsorts (key, side) and classifies each key run
    vectorized.  Returns a Dataset of ``(key, change_type)`` rows.
    """
    from ..state.partitioning import key_partitioned

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "k": pc.cast(t[key], pa.int64()),
                    "v": pc.cast(t[value_col], pa.int64()),
                    "side": pa.array(
                        np.full(t.num_rows, side, dtype=np.int64), pa.int64()
                    ),
                }
            )

        return fn

    both = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow")
    )
    out_schema = pa.schema([("key", pa.int64()), ("change_type", pa.string())])

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        k = t["k"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, k))
        k, v, side = k[order], v[order], side[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        counts = np.diff(np.r_[starts, k.size])
        has_a = side[starts] == 0
        ends = starts + counts - 1
        has_b = side[ends] == 1
        # the classification below assumes each key appears AT MOST ONCE per
        # side; duplicated keys would silently misclassify, so fail loudly
        # (review fix) — dedup the inputs first if versions can repeat keys
        bad = (counts > 2) | ((counts == 2) & (side[starts] == side[ends]))
        if bad.any():
            dupk = k[starts][bad][:5].tolist()
            raise ValueError(
                "table_diff requires unique keys per side; duplicated keys "
                f"found (first few: {dupk})"
            )
        changed = (counts == 2) & (v[starts] != v[ends])
        cls = np.where(
            counts == 2,
            np.where(changed, "changed", "unchanged"),
            np.where(has_b & ~has_a, "added", "removed"),
        )
        return pa.table(
            {"key": pa.array(k[starts], pa.int64()),
             "change_type": pa.array(cls.tolist(), pa.string())},
            schema=out_schema,
        )

    return key_partitioned(both, ["k"], num_partitions).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def upsert_diff(sf_dir: str, upd_pct: int = 20, ins_pct: int = 5):
    """Census of :func:`table_diff` between the base ``documents`` table and
    the :func:`upsert_docs` merge output (byte-length as the compared
    value): how many ids were added / changed / unchanged by the merge —
    ``removed`` is structurally absent (upsert never deletes) and so absent
    from the output on both sides.  Output: ``change_type, n_docs``."""
    from ..functions.groupagg import lowcard_groupagg
    from ..sources.io import read_parquet_clean

    # CHARACTER lengths on both sides: upsert_docs emits n_chars =
    # utf8_length (and the SQL oracle uses length()), so the base side must
    # count characters too — binary_length would misclassify any non-ASCII
    # doc as 'changed' (review fix)
    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    merged = upsert_docs(sf_dir, upd_pct=upd_pct, ins_pct=ins_pct).map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "n_bytes": pc.cast(t["n_chars"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    diff = table_diff(base, merged, "doc_id", "n_bytes")

    def strip(t: pa.Table) -> pa.Table:
        return t.select(["change_type"])

    # n_chars of updated docs grows by 8, inserted docs are new ids, so
    # 'changed'/'added'/'unchanged' fall straight out of the value compare
    return lowcard_groupagg(
        diff.map_batches(strip, batch_format="pyarrow"),
        ["change_type"], [([], "count_all")], {"count_all": "n_docs"},
    )


def split_docs(sf_dir: str, train_pct: int = 80, val_pct: int = 10):
    """DETERMINISTIC 3-WAY SPLIT manifest: every doc labeled train / val /
    test by its content-independent id hash (``md5_low64(id) % 100`` —
    the same family as the decontamination eval split, so split membership
    is stable across runs, machines and partitionings).  Output:
    ``doc_id, split`` — the assignment table every downstream trainer
    joins against."""
    import ray.data as rd

    from ..sources.io import read_parquet_clean

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pct = np.fromiter(
            (_md5_pct(int(d)) for d in ids), np.int64, len(ids)
        )
        split = np.where(
            pct < train_pct, "train",
            np.where(pct < train_pct + val_pct, "val", "test"),
        )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(assign, batch_format="pyarrow")


def _md5_pct(doc_id: int) -> int:
    from ..functions.hashing import md5_low64

    return md5_low64(str(doc_id)) % 100


def epoch_shuffle_docs(sf_dir: str, seed_a: int = 48271, seed_b: int = 11):
    """Deterministic GLOBAL TRAINING-ORDER SHUFFLE — the "epoch permutation"
    every training-data consumer needs: each doc gets its exact position in a
    seeded pseudo-random total order, without ever running a global sort of
    the corpus.

    The shuffle key is an affine permutation ``(a*doc_id + b) mod p`` with
    p = 2^31-1 prime — injective over the id domain, vectorizable in both
    numpy and ANSI SQL (the oracle is ``row_number() OVER (ORDER BY ...)``).
    For id domains beyond 2^31 swap in p = 2^61-1 with 128-bit multiply
    (numpy via split-multiply, DuckDB via HUGEINT) — same plan.

    Distributed rank WITHOUT a global sort (two bounded passes):
    1. keys bucket into 256 ORDER-PRESERVING ranges (``key*256 // p``); one
       map-side-combined count per bucket comes back to the driver (256 rows,
       regardless of corpus size) and prefix-sums into bucket offsets;
    2. one keyed shuffle on bucket co-locates each range, and a vectorized
       block-local sort assigns ``offset[bucket] + rank_within_bucket``.
    The corpus moves through exactly one hash exchange of (doc_id, key) int
    pairs; at 10^12 rows raise the bucket count so per-bucket mass fits a
    block (counts table stays tiny).
    """
    from ..functions.groupagg import lowcard_groupagg
    from ..state.partitioning import key_partitioned, materialize_clean

    from ..sources.io import read_parquet_clean

    P = 2147483647
    NB = 256

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = (seed_a * ids + seed_b) % P
        bucket = (key * NB) // P
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    rows = materialize_clean(
        read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        ).map_batches(keyed, batch_format="pyarrow")
    )

    counts = lowcard_groupagg(
        rows.select_columns(["bucket"]), ["bucket"], [([], "count_all")],
        {"count_all": "n"},
    ).to_pandas().sort_values("bucket")
    offsets = np.zeros(NB, np.int64)
    b = counts["bucket"].to_numpy().astype(np.int64)
    n = counts["n"].to_numpy().astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(n)[:-1]])
    offsets[b] = cum

    def rank_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        key = t["key"].to_numpy(zero_copy_only=False)
        bucket = t["bucket"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, bucket))
        b_s = bucket[order]
        starts = np.flatnonzero(np.concatenate([[True], b_s[1:] != b_s[:-1]]))
        seg_len = np.diff(np.concatenate([starts, [len(b_s)]]))
        within = np.arange(len(b_s), dtype=np.int64) - np.repeat(starts, seg_len)
        pos = offsets[b_s] + within
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return key_partitioned(rows, ["bucket"]).map_batches(
        rank_block, batch_format="pyarrow", batch_size=None
    )


def curriculum_order_docs(sf_dir: str, n_buckets: int = 10,
                          num_blocks: int | None = None):
    """CURRICULUM TRAINING ORDER: shortest-first difficulty buckets with
    round-robin source interleaving — the deterministic "easy-to-hard, no
    source runs" data ordering a curriculum-training recipe consumes.
    Every doc gets (1) a difficulty bucket = exact SQL ``NTILE(n_buckets)``
    over ``(n_chars, doc_id)`` ascending, (2) its rank WITHIN
    ``(bucket, source)`` and (3) its global ``position`` under
    ``(bucket, rn_src, source, doc_id)`` — so consecutive positions inside a
    bucket cycle through sources instead of exhausting one source at a time.
    All keys are integers/strings: parity with the window-function oracle is
    exact, no float ordering anywhere.

    Distributed shape: two narrow global range-sorts of (id, source,
    n_chars) with the sorted-block-offset pattern (per-block row counts from
    block METADATA — no extra pass — prefix-summed into global rank offsets,
    one remote task per block attaches ranks), and one (bucket, source)-keyed
    shuffle for the segmented within-group rank.  The text never moves.
    Output: ``position, doc_id, source, decile, rn_src``."""
    import ray
    import ray.data as rd

    from ..sources.io import read_parquet_clean
    from ..state.partitioning import key_partitioned

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "source": t["source"],
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
            }
        )

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    ).map_batches(prep, batch_format="pyarrow")
    if num_blocks:  # tests: force many tiny sorted blocks through the
        base = base.repartition(num_blocks)  # offset/NTILE boundary math

    out_schema = pa.schema(
        [("position", pa.int64()), ("doc_id", pa.int64()),
         ("source", pa.string()), ("decile", pa.int64()),
         ("rn_src", pa.int64())]
    )

    def sorted_refs_offsets(ds, keys):
        mat = ds.sort(keys).materialize()
        refs, counts = [], []
        for bundle in mat.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                if meta.num_rows:
                    refs.append(ref)
                    counts.append(meta.num_rows)
        offsets = np.concatenate(
            [[0], np.cumsum(counts)[:-1]]
        ).astype(np.int64) if counts else np.zeros(0, np.int64)
        return refs, offsets, int(sum(counts))

    refs, offsets, n = sorted_refs_offsets(base, ["n_chars", "doc_id"])
    if not refs:
        return out_schema.empty_table()

    k = n_buckets
    big = n % k
    big_sz = n // k + 1
    small_sz = max(n // k, 1)  # guard: np.where evaluates the unused lane
    cut = big * big_sz

    @ray.remote
    def tag(t: pa.Table, off: int) -> pa.Table:
        r = off + np.arange(t.num_rows, dtype=np.int64)  # 0-based global rank
        decile = np.where(
            r < cut, r // big_sz, big + (r - cut) // small_sz
        ) + 1
        return t.append_column(
            "decile", pa.array(decile.astype(np.int64), pa.int64())
        )

    tagged = rd.from_arrow_refs(
        [tag.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )

    def seg_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("rn_src", pa.array([], pa.int64()))
        dec = t["decile"].to_numpy(zero_copy_only=False)
        src = t["source"].combine_chunks().dictionary_encode()
        codes = src.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nch = t["n_chars"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, nch, codes, dec))
        d_s, c_s = dec[order], codes[order]
        new = np.concatenate(
            ([True], (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1]))
        )
        idx = np.arange(len(order), dtype=np.int64)
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rn = np.empty(len(order), dtype=np.int64)
        rn[order] = idx - start + 1
        return t.append_column("rn_src", pa.array(rn, pa.int64()))

    ranked = key_partitioned(tagged, ["decile", "source"]).map_batches(
        seg_rank, batch_format="pyarrow", batch_size=None
    )

    refs2, offsets2, _ = sorted_refs_offsets(
        ranked, ["decile", "rn_src", "source", "doc_id"]
    )

    @ray.remote
    def pos(t: pa.Table, off: int) -> pa.Table:
        p = off + 1 + np.arange(t.num_rows, dtype=np.int64)
        return pa.table(
            {
                "position": pa.array(p, pa.int64()),
                "doc_id": t["doc_id"],
                "source": t["source"],
                "decile": t["decile"],
                "rn_src": t["rn_src"],
            },
            schema=out_schema,
        )

    return rd.from_arrow_refs(
        [pos.remote(r, int(o)) for r, o in zip(refs2, offsets2)]
    )


def source_quota_sample(sf_dir: str, budget: int = 100):
    """TARGET-MIX SAMPLE MANIFEST by LARGEST-REMAINDER apportionment
    (Hamilton's method): split a fixed ``budget`` of sample slots across
    sources proportionally to their doc counts — integer quotas =
    ``floor(budget * n_s / N)`` plus one extra for the largest remainders
    (ties by source name) so quotas sum EXACTLY to ``budget`` — then fill
    each source's quota with its ``quota_s`` smallest-id-hash docs (the
    deterministic per-group bottom-k rule shared with
    ``bottomk_sample_docs``).  The manifest a mixture-controlled training
    run consumes: every step is integer or hash math, zero float drift.

    Distributed shape: one low-cardinality count combine (sources), quota
    arithmetic on the driver (|sources| rows), then per-block bottom-quota
    partials (bounded ``budget`` rows per block) merged once — the corpus
    streams, the text never moves.  Output: ``doc_id, source``."""
    import pandas as pd

    from ..functions.hashing import md5_low64
    from ..sources.io import read_parquet_clean

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    part_schema = pa.schema(
        [("doc_id", pa.int64()), ("source", pa.string()), ("h", pa.uint64())]
    )

    def hash_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = np.fromiter(
            (md5_low64(str(int(d))) for d in ids), np.uint64, len(ids)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": batch["source"],
                "h": pa.array(hs, pa.uint64()),
            },
            schema=part_schema,
        )

    hashed = docs.map_batches(hash_partial, batch_format="pyarrow")

    # source counts: one tiny combine (|sources| rows per block)
    counts = (
        hashed.map_batches(
            lambda t: t.group_by(["source"]).aggregate([([], "count_all")]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("source", sort=True)["count_all"]
        .sum()
    )
    n_total = int(counts.sum())
    if n_total == 0:
        return pa.schema(
            [("doc_id", pa.int64()), ("source", pa.string())]
        ).empty_table()
    sources = list(counts.index)
    num = np.array([budget * int(c) for c in counts], dtype=np.int64)
    base = num // n_total
    rem = num % n_total
    extra = budget - int(base.sum())
    # largest remainder, ties by source ascending (sources already sorted)
    order = np.lexsort((np.arange(len(sources)), -rem))
    quota = base.copy()
    quota[order[:extra]] += 1
    quotas = {s: int(q) for s, q in zip(sources, quota)}

    def bottom_quota(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = batch.to_pandas().sort_values(["h", "doc_id"], kind="mergesort")
        parts = [
            g.head(quotas.get(s, 0)) for s, g in df.groupby("source", sort=False)
        ]
        out = pd.concat(parts) if parts else df.iloc[:0]
        return pa.Table.from_pandas(out, schema=part_schema,
                                    preserve_index=False)

    partials = hashed.map_batches(
        bottom_quota, batch_format="pyarrow"
    ).to_pandas()
    final_parts = []
    for s, g in partials.groupby("source", sort=True):
        final_parts.append(
            g.sort_values(["h", "doc_id"], kind="mergesort").head(quotas[s])
        )
    final = pd.concat(final_parts) if final_parts else partials.iloc[:0]
    return pa.table(
        {
            "doc_id": pa.array(final["doc_id"].to_numpy(np.int64), pa.int64()),
            "source": pa.array(final["source"].astype(str), pa.string()),
        }
    )
