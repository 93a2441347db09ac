"""The flagship near-duplicate pipeline (north_star):

    transcripts
      -> assemble (keyed shuffle on conv_id)                 [stages/assemble]
      -> rep-annotate (keyed shuffle on fingerprint)         [stages/exact]
      -> MinHash/SimHash signatures over REPRESENTATIVES
         (autoscaling actor pool)                            [stages/signatures]
      -> band buckets UNION anchor buckets                   [stages/lsh, substring]
      -> keyed bucket shuffle -> vectorized pair-gen ->
         distinct                                            [stages/lsh]
      -> ONE unified verify (hash joins + actor pool):
         exact Jaccard dups AND substring candidates         [stages/verify]
      -> broadcast exact-text confirm for substring cands    [stages/substring]
      -> union-find clustering                               [stages/cluster]

Fusing the substring anchor pass into the LSH bucket chain (same (bucket,
conv_id) schema, disjoint hashed key spaces) halves the shuffle/execution
count versus running two separate candidate pipelines — at 100 TB that is one
exchange over the bucket table instead of two, and locally it removes ~4
fixed-overhead executions.

Only fingerprint REPRESENTATIVES flow through signatures/LSH/verify — exact
copies (including all degenerate docs) are collapsed first (SURVEY §4).

End-to-end semantics are pinned by the NumPy oracle
(``near_duplicate_detection_ray.oracle``): dup-pair recall >= 0.99 at identical
config, asserted in tests/test_pipeline_e2e.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import NDDConfig
from ..stages.assemble import assemble_conversations
from ..stages.cluster import cluster as cluster_components
from ..stages.exact import annotate_reps
from ..stages.lsh import candidate_pairs, explode_bands
from ..stages.signatures import sign_conversations
from ..stages.substring import anchor_buckets, confirm_substring
from ..stages.verify import verify_pairs
from ..state.partitioning import materialize_clean


def exact_edges(rep_map):
    """(conv_id, rep_id) -> (a, b) union-find edges for non-representatives."""
    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["conv_id"], t["rep_id"]))
        return pa.table({"a": t["rep_id"], "b": t["conv_id"]})

    return rep_map.map_batches(fn, batch_format="pyarrow")


def near_dup_pipeline(
    transcripts,
    cfg: NDDConfig | None = None,
    include_substring: bool = True,
    concurrency=None,
    num_partitions: int | None = None,
    max_driver_edges: int | None = None,
):
    """Run the full pipeline; returns a dict of Datasets:

    ``conversations`` (all convs, + rep_id), ``rep_map``, ``signatures``
    (reps only), ``dup_pairs`` (rep domain, jaccard >= tau),
    ``substring_pairs`` (optional), ``clusters`` (every conv -> cluster_id).

    ``conversations``/``signatures``/``verified`` are materialized because
    multiple downstream stages consume them (checkpointed runs write Parquet
    instead — see stages/checkpoint.py); everything else streams.
    """
    cfg = cfg or NDDConfig()
    assembled = assemble_conversations(transcripts, num_partitions)
    if cfg.strip_boilerplate:
        from ..stages.boilerplate import strip_boilerplate

        assembled = strip_boilerplate(assembled, cfg, num_partitions)
    conversations = materialize_clean(
        annotate_reps(assembled, num_partitions=num_partitions)
    )
    rep_map = conversations.select_columns(["conv_id", "rep_id"])
    reps = conversations.map_batches(
        lambda t: t.filter(pc.equal(t["conv_id"], t["rep_id"])),
        batch_format="pyarrow",
    )
    signatures = materialize_clean(
        sign_conversations(reps, cfg, concurrency=concurrency)
    )

    buckets = explode_bands(signatures, cfg)
    if include_substring:
        buckets = buckets.union(anchor_buckets(signatures, cfg))
    cand = candidate_pairs(buckets, cfg, num_partitions)
    verified = materialize_clean(
        verify_pairs(cand, signatures, cfg, concurrency=concurrency,
                     num_partitions=num_partitions)
    )
    dup_pairs = verified.map_batches(
        lambda t: t.filter(pc.equal(t["method"], "minhash")), batch_format="pyarrow"
    )

    edge_sets = [exact_edges(rep_map), dup_pairs]
    sub_pairs = None
    if include_substring:
        sub_cand = verified.map_batches(
            lambda t: t.filter(pc.equal(t["method"], "substring")),
            batch_format="pyarrow",
        )
        sub_pairs = confirm_substring(sub_cand, conversations)
        edge_sets.append(sub_pairs)

    clusters = cluster_components(conversations, edge_sets, max_driver_edges)

    out = {
        "conversations": conversations,
        "rep_map": rep_map,
        "signatures": signatures,
        "dup_pairs": dup_pairs,
        "clusters": clusters,
    }
    if sub_pairs is not None:
        out["substring_pairs"] = sub_pairs
    return out


def _occurrence_census(ds, text_col: str, out_col: str, min_occ: int,
                       min_convs: int, num_partitions: int | None):
    """Shared dedup-census kernel: one keyed hash-partition on ``text_col``
    puts every identical value in one block, so the block-local Arrow
    ``count`` / ``count_distinct`` are global — the same one-shuffle
    discipline as ``functions/groupagg.highcard_groupagg``.  Output:
    (``out_col``, n_occurrences, n_convs) filtered to ``min_occ``/
    ``min_convs``."""
    from ..state.partitioning import key_partitioned

    schema = pa.schema(
        [(out_col, pa.string()), ("n_occurrences", pa.int64()),
         ("n_convs", pa.int64())]
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=schema)
        a = t.group_by([text_col]).aggregate(
            [("conv_id", "count_distinct"), ([], "count_all")]
        )
        out = pa.table(
            {
                out_col: a[text_col],
                "n_occurrences": pc.cast(a["count_all"], pa.int64()),
                "n_convs": pc.cast(a["conv_id_count_distinct"], pa.int64()),
            },
            schema=schema,
        )
        keep = pc.and_(
            pc.greater_equal(out["n_occurrences"], min_occ),
            pc.greater_equal(out["n_convs"], min_convs),
        )
        return out.filter(keep)

    return key_partitioned(ds, [text_col], num_partitions).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def dup_turns(transcripts, num_partitions: int | None = None):
    """TURN-level exact dedup census: every non-empty turn text that occurs
    more than once across the corpus, with its occurrence count and the
    number of distinct conversations it appears in — the fine-grained
    companion to conversation-level exact dedup (repeated boilerplate turns,
    canned assistant replies, copy-pasted tool outputs).  Output:
    (turn_text, n_occurrences, n_convs) where n_occurrences > 1."""
    ds = transcripts.select_columns(["conv_id", "text"]).map_batches(
        lambda t: t.filter(pc.not_equal(t["text"], "")), batch_format="pyarrow"
    )
    return _occurrence_census(ds, "text", "turn_text", 2, 1, num_partitions)


def dup_turn_windows(transcripts, k: int = 3, num_partitions: int | None = None):
    """Cross-conversation duplicated ``k``-turn WINDOW census: every run of
    ``k`` consecutive turns whose exact text sequence appears in >= 2 distinct
    conversations — copied sub-dialogues (retried exchanges, pasted few-shot
    blocks, templated multi-turn flows) that single-turn dedup (``dup_turns``)
    and whole-conversation dedup both miss.

    Two keyed shuffles: by ``conv_id`` so each conversation's turns are
    block-local for vectorized window construction (one lexsort + one
    ``binary_join_element_wise`` per block — no per-turn Python), then by the
    window text for the global census (block-local Arrow count /
    count_distinct are global after the key partition).  Windows require
    CONTIGUOUS ``turn_idx`` (i, i+1, .., i+k-1) within one conversation, so
    the operator is correct on any transcripts input, not just the dense
    synthetic corpus.  Output: (win_text — the \\x1f-joined turn texts,
    n_occurrences, n_convs) with n_convs >= 2.
    """
    wins = _turn_windows(transcripts, k, "\x1f", num_partitions)
    return _occurrence_census(wins, "win_text", "win_text", 1, 2, num_partitions)


def _turn_windows(transcripts, k: int, sep: str, num_partitions: int | None):
    """(conv_id, start_tix, win_text) rows for every run of ``k`` contiguous
    turns, via one conv_id-keyed shuffle and a vectorized block kernel (one
    lexsort + one ``binary_join_element_wise`` per block — no per-turn
    Python).  Windows require CONTIGUOUS ``turn_idx`` (i, i+1, .., i+k-1)
    within one conversation, so the builders are correct on any transcripts
    input, not just the dense synthetic corpus."""
    import numpy as np

    from ..state.partitioning import key_partitioned

    ds = transcripts.select_columns(["conv_id", "turn_idx", "text"])
    schema = pa.schema(
        [("conv_id", pa.string()), ("start_tix", pa.int64()),
         ("win_text", pa.string())]
    )

    def windows_block(t: pa.Table) -> pa.Table:
        if t.num_rows < k or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=schema)
        conv = t["conv_id"].combine_chunks()
        enc = conv.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tix = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tix, codes))
        co = codes[order]
        to = tix[order]
        n = len(order)
        m = n - (k - 1)
        # window start i valid iff EVERY adjacent step within turns
        # i..i+k-1 stays in the conv with turn_idx advancing by exactly 1
        # (pairwise, so duplicate turn_idx values can't fake contiguity)
        d = (co[1:] == co[:-1]) & (to[1:] - to[:-1] == 1)
        valid = np.ones(m, dtype=bool)
        for j in range(k - 1):
            valid &= d[j : j + m]
        starts = np.flatnonzero(valid)
        if len(starts) == 0:
            return pa.Table.from_pylist([], schema=schema)
        text = t["text"].combine_chunks()
        cols = [text.take(pa.array(order[starts + j])) for j in range(k)]
        win = pc.binary_join_element_wise(*cols, sep)
        return pa.table(
            {
                "conv_id": conv.take(pa.array(order[starts])),
                "start_tix": pa.array(to[starts], pa.int64()),
                "win_text": win,
            },
            schema=schema,
        )

    return key_partitioned(ds, ["conv_id"], num_partitions).map_batches(
        windows_block, batch_format="pyarrow", batch_size=None
    )


def _qa_exchanges(transcripts, num_partitions: int | None):
    """(conv_id, start_tix, q_text, a_text) for every adjacent (role='user',
    role='assistant') turn pair with ``turn_idx`` advancing by exactly 1 —
    the shared builder behind ``qa_pair_dups`` (exact census) and
    ``qa_pair_near_dups`` (fuzzy join).  One conv_id-keyed shuffle, one
    lexsort per block, no per-turn Python."""
    import numpy as np

    from ..state.partitioning import key_partitioned

    ds = transcripts.select_columns(["conv_id", "turn_idx", "role", "text"])
    pair_schema = pa.schema(
        [("conv_id", pa.string()), ("start_tix", pa.int64()),
         ("q_text", pa.string()), ("a_text", pa.string())]
    )

    def pairs_block(t: pa.Table) -> pa.Table:
        if t.num_rows < 2 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=pair_schema)
        conv = t["conv_id"].combine_chunks()
        codes = conv.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        tix = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tix, codes))
        co, to = codes[order], tix[order]
        is_user = pc.equal(t["role"], "user").to_numpy(
            zero_copy_only=False
        )[order]
        is_asst = pc.equal(t["role"], "assistant").to_numpy(
            zero_copy_only=False
        )[order]
        starts = np.flatnonzero(
            (co[1:] == co[:-1]) & (to[1:] - to[:-1] == 1)
            & is_user[:-1] & is_asst[1:]
        )
        if len(starts) == 0:
            return pa.Table.from_pylist([], schema=pair_schema)
        text = t["text"].combine_chunks()
        return pa.table(
            {
                "conv_id": conv.take(pa.array(order[starts])),
                "start_tix": pa.array(to[starts], pa.int64()),
                "q_text": text.take(pa.array(order[starts])),
                "a_text": text.take(pa.array(order[starts + 1])),
            },
            schema=pair_schema,
        )

    return key_partitioned(ds, ["conv_id"], num_partitions).map_batches(
        pairs_block, batch_format="pyarrow", batch_size=None
    )


def qa_pair_dups(transcripts, num_partitions: int | None = None):
    """Cross-conversation duplicated EXCHANGE census: every (user prompt ->
    immediately following assistant reply) pair whose exact (q, a) texts
    appear in >= 2 distinct conversations — canned prompt/completion pairs
    repeated across a corpus (templated support replies, copied few-shot
    exemplars, cached completions re-served to different sessions).  The
    training-data signal is ROLE-aware: ``dup_turns`` finds repeated single
    turns and ``dup_turn_windows`` repeated k-turn runs, but neither binds a
    prompt to ITS reply, which is the unit instruction-tuning pipelines
    dedupe on.

    Reference analogue: the reference dedupes whole frame sequences
    (``ndd/shotdetect.py:80-83``); the role-paired unit is this engine's
    transcript-native refinement.

    Two keyed shuffles, mirroring ``dup_turn_windows``: by ``conv_id`` so
    each conversation's turns are block-local for the vectorized adjacent
    (role='user', role='assistant', turn_idx contiguous) pairing — one
    lexsort per block, no per-turn Python — then by ``(q_text, a_text)``
    for the global census (block-local Arrow ``count`` / ``count_distinct``
    are global after the key partition).  Adjacency requires ``turn_idx``
    advancing by exactly 1 inside one conversation, so the operator is
    correct on any transcripts input (missing turns never fake adjacency).
    Output: (q_text, a_text, n_occurrences, n_convs) with n_convs >= 2.
    """
    from ..state.partitioning import key_partitioned

    qa = _qa_exchanges(transcripts, num_partitions)

    out_schema = pa.schema(
        [("q_text", pa.string()), ("a_text", pa.string()),
         ("n_occurrences", pa.int64()), ("n_convs", pa.int64())]
    )

    def census_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        a = t.group_by(["q_text", "a_text"]).aggregate(
            [("conv_id", "count_distinct"), ([], "count_all")]
        )
        out = pa.table(
            {
                "q_text": a["q_text"],
                "a_text": a["a_text"],
                "n_occurrences": pc.cast(a["count_all"], pa.int64()),
                "n_convs": pc.cast(a["conv_id_count_distinct"], pa.int64()),
            },
            schema=out_schema,
        )
        return out.filter(pc.greater_equal(out["n_convs"], 2))

    return key_partitioned(
        qa, ["q_text", "a_text"], num_partitions
    ).map_batches(census_block, batch_format="pyarrow", batch_size=None)


def qa_pair_near_dups(transcripts, n: int = 3, tau: float = 0.7,
                      num_partitions: int | None = None):
    """FUZZY role-aware exchange dedup: all CROSS-conversation pairs of
    (user prompt -> assistant reply) exchanges whose normalized token
    ``n``-gram Jaccard >= ``tau`` — the near-dup companion to
    ``qa_pair_dups``'s exact census (catches templated replies with one
    substituted value, lightly-edited canned answers), completing the
    exact/fuzzy symmetry the turn-window and assistant-side families have.

    Exchanges become documents (id ``conv_id#start_tix``, text = lowercased
    ``q + ' ' + a``) and the EXACT prefix-filter Jaccard join
    (``docs_dedup.ngram_jaccard_join``) runs over them unchanged.
    Same-conversation pairs are excluded.  Output: (a, b, jaccard), a < b.
    """
    from .docs_dedup import ngram_grams_over, ngram_jaccard_join
    from ..state.partitioning import materialize_clean

    qa = _qa_exchanges(transcripts, num_partitions)

    def as_docs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"conv_id": pa.array([], pa.string()),
                 "doc_text": pa.array([], pa.string())}
            )
        wid = pc.binary_join_element_wise(
            t["conv_id"], pc.cast(t["start_tix"], pa.string()), "#"
        )
        body = pc.binary_join_element_wise(t["q_text"], t["a_text"], " ")
        return pa.table({"conv_id": wid, "doc_text": pc.utf8_lower(body)})

    sigs = materialize_clean(
        ngram_grams_over(qa.map_batches(as_docs, batch_format="pyarrow"), n)
    )
    pairs = ngram_jaccard_join(sigs, tau=tau, int_ids=False)

    def cross_conv_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        conv_a = pc.replace_substring_regex(t["a"], r"#[0-9]+$", "")
        conv_b = pc.replace_substring_regex(t["b"], r"#[0-9]+$", "")
        return t.filter(pc.not_equal(conv_a, conv_b))

    return pairs.map_batches(cross_conv_only, batch_format="pyarrow")


def turn_window_near_dups(transcripts, k: int = 3, n: int = 3,
                          tau: float = 0.7,
                          num_partitions: int | None = None):
    """FUZZY sub-dialogue dedup: all CROSS-conversation pairs of ``k``-turn
    windows whose normalized token-``n``-gram Jaccard >= ``tau`` — the
    near-dup companion to ``dup_turn_windows``'s exact census (catches
    lightly-edited copied exchanges, e.g. a pasted few-shot block with one
    substituted value, that exact window dedup misses).

    Windows become documents: id ``conv_id#start_tix``, text = the k turn
    texts joined with single spaces and lowercased (the engine-standard
    normalization), then the whole EXACT prefix-filter Jaccard join
    (``docs_dedup.ngram_jaccard_join`` — PPJoin canonical order, broadcast
    df map, packed-set verification) runs over the window corpus unchanged.
    Same-conversation pairs are excluded (overlapping windows of one conv
    trivially share k-1 turns).  Output: (a, b, jaccard) with window ids as
    strings, a < b.
    """
    from .docs_dedup import ngram_grams_over, ngram_jaccard_join
    from ..state.partitioning import materialize_clean

    wins = _turn_windows(transcripts, k, " ", num_partitions)

    def as_docs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"conv_id": pa.array([], pa.string()),
                 "doc_text": pa.array([], pa.string())}
            )
        wid = pc.binary_join_element_wise(
            t["conv_id"], pc.cast(t["start_tix"], pa.string()), "#"
        )
        return pa.table(
            {"conv_id": wid, "doc_text": pc.utf8_lower(t["win_text"])}
        )

    sigs = materialize_clean(
        ngram_grams_over(wins.map_batches(as_docs, batch_format="pyarrow"), n)
    )
    pairs = ngram_jaccard_join(sigs, tau=tau, int_ids=False)

    def cross_conv_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        conv_a = pc.replace_substring_regex(t["a"], r"#[0-9]+$", "")
        conv_b = pc.replace_substring_regex(t["b"], r"#[0-9]+$", "")
        return t.filter(pc.not_equal(conv_a, conv_b))

    return pairs.map_batches(cross_conv_only, batch_format="pyarrow")


def _turn_token_counts(t: pa.Table) -> "np.ndarray":
    """Whitespace-token count per turn text (single-space join), with empty
    turns counted as 0 — ONE kernel shared by tool_usage and
    conversation_stats so both SQL-gated queries agree on n_tok."""
    import numpy as np

    toks = pc.split_pattern(t["text"].combine_chunks(), pattern=" ")
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype("int64")
    n[pc.equal(t["text"], "").to_numpy(zero_copy_only=False)] = 0
    return n


def tool_usage(transcripts, num_partitions: int | None = None):
    """Per-(role, tool) usage census over a transcripts table: turn count,
    distinct-conversation count, total whitespace tokens.

    Two decomposed passes, each scale-safe: (1) turn counts and token sums
    are plain combiner partials (low-cardinality group, map-side combine);
    (2) the distinct-conversation count routes through ONE keyed partition
    on conv_id and a block-local distinct of (role, tool, conv_id) triples —
    output bounded by n_convs x |groups|, never a hot (role, tool)
    partition holding the whole corpus."""
    from ..functions.groupagg import lowcard_groupagg
    from ..state.partitioning import key_partitioned

    ds = transcripts.select_columns(["conv_id", "role", "tool", "text"])

    def tok_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {"role": t["role"], "tool": t["tool"],
             "n_tok": pa.array(_turn_token_counts(t), pa.int64())}
        )

    counts = lowcard_groupagg(
        ds.map_batches(tok_partial, batch_format="pyarrow"),
        ["role", "tool"],
        [("n_tok", "sum"), ([], "count_all")],
        {"n_tok_sum": "n_tokens", "count_all": "n_turns"},
    )

    def triple_distinct(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("role", pa.string()), ("tool", pa.string()),
             ("conv_id", pa.string())]
        )
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=schema)
        g = t.group_by(["role", "tool", "conv_id"]).aggregate([])
        return g.select(["role", "tool", "conv_id"]).cast(schema)

    triples = key_partitioned(
        ds.select_columns(["conv_id", "role", "tool"]), ["conv_id"], num_partitions
    ).map_batches(triple_distinct, batch_format="pyarrow", batch_size=None)
    convs = lowcard_groupagg(
        triples, ["role", "tool"], [([], "count_all")], {"count_all": "n_convs"}
    )

    ct = pa.concat_tables(
        b for b in counts.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    )
    cv = pa.concat_tables(
        b for b in convs.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows and b.num_columns
    )
    import ray.data as rd

    joined = ct.join(cv, keys=["role", "tool"], join_type="inner")
    joined = joined.sort_by([("role", "ascending"), ("tool", "ascending")])
    return rd.from_arrow(
        joined.select(["role", "tool", "n_turns", "n_convs", "n_tokens"])
    )


def strip_boilerplate_turns(transcripts, max_convs: int = 3,
                            num_partitions: int | None = None):
    """Turn-level BOILERPLATE removal — the transcript-domain cousin of the
    reference's letterbox strip (M7): any turn text appearing in more than
    ``max_convs`` distinct conversations (canned greetings, repeated tool
    banners) is dropped from every conversation; empty turns drop too.

    Shape: the :func:`dup_turns` census bounds the boilerplate set (its
    distinct texts are FEW by definition — each costs > max_convs corpus
    occurrences), the set is built off-driver and broadcast once
    (``distinct_values_ref``), and the transcripts stream through one
    vectorized ``pc.is_in`` anti-filter.  No shuffle of the transcript
    table.  Output: (conv_id, turn_idx, role, text) survivors."""
    import ray

    from ..state.partitioning import distinct_values_ref

    census = dup_turns(transcripts, num_partitions)
    boiler = census.map_batches(
        lambda t: t.filter(pc.greater(t["n_convs"], max_convs))
                   .select(["turn_text"]),
        batch_format="pyarrow",
    )
    ref, n_boiler = distinct_values_ref(boiler, ["turn_text"])

    out_schema = pa.schema(
        [("conv_id", pa.string()), ("turn_idx", pa.int64()),
         ("role", pa.string()), ("text", pa.string())]
    )

    def strip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        keep = pc.invert(pc.equal(t["text"], ""))
        if n_boiler:
            bad = pc.is_in(t["text"], value_set=ray.get(ref))
            keep = pc.and_(keep, pc.invert(bad))
        t = t.filter(keep)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
                "role": t["role"],
                "text": t["text"],
            },
            schema=out_schema,
        )

    return transcripts.select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    ).map_batches(strip, batch_format="pyarrow")


def conversation_stats(transcripts, num_partitions: int | None = None):
    """Per-conversation PROFILE: turn count, whitespace-token total, and
    tool-call count — the basic transcript census a pipeline operator reads
    before sizing dedup runs.  One keyed hash-partition on conv_id, then a
    block-local Arrow group_by (conversations are whole per block)."""
    from ..state.partitioning import key_partitioned

    ds = transcripts.select_columns(["conv_id", "text", "tool"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "n_tok": pa.array(_turn_token_counts(t), pa.int64()),
                "is_tool": pc.cast(
                    pc.invert(pc.equal(t["tool"], "")), pa.int64()),
            }
        )

    def block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("conv_id", pa.string()), ("n_turns", pa.int64()),
             ("n_tokens", pa.int64()), ("n_tool_calls", pa.int64())]
        )
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=schema)
        a = t.group_by(["conv_id"]).aggregate(
            [("n_tok", "sum"), ("is_tool", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "conv_id": a["conv_id"],
                "n_turns": pc.cast(a["count_all"], pa.int64()),
                "n_tokens": pc.cast(a["n_tok_sum"], pa.int64()),
                "n_tool_calls": pc.cast(a["is_tool_sum"], pa.int64()),
            },
            schema=schema,
        )

    return key_partitioned(
        ds.map_batches(prep, batch_format="pyarrow"), ["conv_id"], num_partitions
    ).map_batches(block, batch_format="pyarrow", batch_size=None)


def role_transitions(transcripts, num_partitions: int | None = None):
    """ROLE-TRANSITION census over a transcripts table: for every ordered
    pair of consecutive turns within a conversation (stable ``(conv_id,
    turn_idx)`` order — the input_hint invariant), count the corpus-wide
    transitions and the distinct conversations containing each — the
    dialogue-structure profile (who follows whom) a conversation-data audit
    starts from, and the transcript-native sibling of
    ``relational.event_transitions``.

    ONE conv-keyed partition; the block kernel lexsorts by (conv, turn),
    masks conversation boundaries, and emits bounded (role_from, role_to,
    conv) partials — per-conv distinct inside the block, low-cardinality
    combine outside.  Output: ``role_from, role_to, n_transitions, n_convs``.
    """
    import numpy as np

    from ..functions.groupagg import lowcard_groupagg
    from ..state.partitioning import key_partitioned

    ds = transcripts.select_columns(["conv_id", "turn_idx", "role"])

    def block(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("role_from", pa.string()), ("role_to", pa.string()),
             ("n_transitions", pa.int64()), ("n_conv_part", pa.int64())]
        )
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        tix = t["turn_idx"].to_numpy(zero_copy_only=False)
        role = t["role"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tix, conv))
        conv, role = conv[order], role[order]
        same = conv[1:] == conv[:-1]
        if not same.any():
            return schema.empty_table()
        frm, to = role[:-1][same], role[1:][same]
        cid = conv[1:][same]
        part = pa.table(
            {
                "role_from": pa.array(frm, pa.string()),
                "role_to": pa.array(to, pa.string()),
                "conv_id": pa.array(cid, pa.string()),
            }
        )
        g = part.group_by(["role_from", "role_to", "conv_id"]).aggregate(
            [([], "count_all")]
        )
        # within one conv-keyed block: per-(from,to) transition totals and
        # per-conv presence collapse to bounded rows
        g2 = g.group_by(["role_from", "role_to"]).aggregate(
            [("count_all", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "role_from": g2["role_from"],
                "role_to": g2["role_to"],
                "n_transitions": pc.cast(g2["count_all_sum"], pa.int64()),
                "n_conv_part": pc.cast(g2["count_all"], pa.int64()),
            },
            schema=schema,
        )

    parts = key_partitioned(ds, ["conv_id"], num_partitions).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )
    return lowcard_groupagg(
        parts,
        ["role_from", "role_to"],
        [("n_transitions", "sum"), ("n_conv_part", "sum")],
        {"n_transitions_sum": "n_transitions", "n_conv_part_sum": "n_convs"},
    )


def dup_pair_turn_overlap(transcripts, cfg: NDDConfig | None = None,
                          num_partitions: int | None = None):
    """DUP-PAIR DIAGNOSTICS at TURN granularity: for every flagship
    (minhash-confirmed) dup pair, the number of exactly-shared distinct
    turn texts and the overlap fraction ``|A ∩ B| / min(|A|, |B|)`` — the
    per-pair explanation of WHERE the duplication lives (whole-transcript
    copies score 1.0; paraphrased near-dups score low despite high shingle
    Jaccard).

    Shape: the flagship pipeline yields the bounded pair set; turn texts
    hash to 64-bit ids and collapse to per-conversation packed SETS inside
    one conv-keyed partition, semi-filtered to pair endpoints FIRST
    (``pc.is_in`` off-driver set — turns of unpaired conversations never
    shuffle); two hash joins attach both endpoints' sets and the
    intersection sizes come from the same zero-copy lexsort kernel the
    Verifier uses (``functions/similarity.batch_set_stats_arrow``).
    Output: ``a, b, n_shared_turns, n_turns_a, n_turns_b, turn_overlap``.
    """
    import numpy as np

    from ..functions.hashing import md5_low64_column
    from ..functions.similarity import batch_set_stats_arrow
    from ..state.partitioning import (
        distinct_values_ref,
        key_partitioned,
        materialize_clean,
        resolve_partitions,
        semi_filter,
    )

    num_partitions = resolve_partitions(num_partitions)
    res = near_dup_pipeline(transcripts, cfg, include_substring=False)
    pairs = materialize_clean(
        res["dup_pairs"]
        .map_batches(
            lambda t: t.filter(pc.equal(t["method"], "minhash")).select(["a", "b"]),
            batch_format="pyarrow",
        )
    )
    out_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()),
         ("n_shared_turns", pa.int64()), ("n_turns_a", pa.int64()),
         ("n_turns_b", pa.int64()), ("turn_overlap", pa.float64())]
    )
    if pairs.count() == 0:
        import ray.data as rd

        # a pyarrow Table keeps its column names through to_pandas();
        # an EMPTY Ray Dataset does not (blockless to_pandas drops the
        # schema), so empty results return the Table directly
        return out_schema.empty_table()
    ids_ref, _n = distinct_values_ref(pairs, ["a", "b"])

    def turn_hashes(t: pa.Table) -> pa.Table:
        # buffer-sliced md5 (no per-row str materialization) — round-4
        # verdict item #3
        h = md5_low64_column(pc.cast(t["text"], pa.string()))
        return pa.table(
            {"conv_id": t["conv_id"],
             "h": pa.array(h.view(np.int64), pa.int64())}
        )

    turns = semi_filter(
        transcripts.select_columns(["conv_id", "text"]).map_batches(
            turn_hashes, batch_format="pyarrow"
        ),
        "conv_id",
        ids_ref,
    )

    def pack_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table(
                {"conv_id": pa.array([], pa.string()),
                 "tset": pa.array([], pa.binary())}
            )
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((h, conv))
        conv, h = conv[order], h[order]
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        blobs, names = [], []
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < starts.size else conv.size
            blobs.append(np.unique(h[s:e]).tobytes())
            names.append(conv[s])
        return pa.table(
            {"conv_id": pa.array(names, pa.string()),
             "tset": pa.array(blobs, pa.binary())}
        )

    tsets = materialize_clean(
        key_partitioned(turns, ["conv_id"], num_partitions).map_batches(
            pack_block, batch_format="pyarrow", batch_size=None
        )
    )
    j = pairs.join(
        tsets, join_type="inner", num_partitions=num_partitions,
        on=("a",), right_on=("conv_id",), right_suffix="_a",
    ).rename_columns({"tset": "tset_a"})
    j = materialize_clean(j)
    j = j.join(
        tsets, join_type="inner", num_partitions=num_partitions,
        on=("b",), right_on=("conv_id",), right_suffix="_b",
    ).rename_columns({"tset": "tset_b"})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        inter, na, nb = batch_set_stats_arrow(t["tset_a"], t["tset_b"])
        mn = np.minimum(na, nb)
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "n_shared_turns": pa.array(inter.astype(np.int64), pa.int64()),
                "n_turns_a": pa.array(na.astype(np.int64), pa.int64()),
                "n_turns_b": pa.array(nb.astype(np.int64), pa.int64()),
                "turn_overlap": pa.array(
                    inter.astype(np.float64) / mn.astype(np.float64),
                    pa.float64(),
                ),
            },
            schema=out_schema,
        )

    return j.map_batches(finish, batch_format="pyarrow")


def turn_length_stats(transcripts, num_partitions: int | None = None):
    """Per-ROLE turn-length census over a transcripts table: turn count,
    token total, longest turn and mean turn length for each speaker role —
    the dialogue-balance profile (is the assistant monologuing?) read before
    tuning turn-level filters.  Pure map-side combine: roles are
    low-cardinality, so per-block partials (count/sum/max per role) fold
    through ``lowcard_groupagg`` with NO keyed shuffle of the fact rows;
    only the final mean is floating point (one IEEE division, same as SQL).
    Output: ``role, n_turns, n_tokens, max_turn_tokens, avg_turn_tokens``."""
    from ..functions.groupagg import lowcard_groupagg

    ds = transcripts.select_columns(["role", "text"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "role": t["role"],
                "n_tok": pa.array(_turn_token_counts(t), pa.int64()),
            }
        )

    agg = lowcard_groupagg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["role"],
        [("n_tok", "sum"), ("n_tok", "max"), ([], "count_all")],
        {"n_tok_sum": "n_tokens", "n_tok_max": "max_turn_tokens",
         "count_all": "n_turns"},
    )

    def finish(t: pa.Table) -> pa.Table:
        import numpy as np

        n_turns = t["n_turns"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "role": t["role"],
                "n_turns": pa.array(n_turns, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "max_turn_tokens": pc.cast(t["max_turn_tokens"], pa.int64()),
                "avg_turn_tokens": pa.array(n_tok / n_turns, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def conv_depth_histogram(transcripts, num_partitions: int | None = None):
    """Histogram of CONVERSATION DEPTH (turns per conversation) — the shape
    census behind context-length budgeting: how much of the corpus is
    single-exchange vs long-tail dialogue.  Rides :func:`conversation_stats`
    (one conv-keyed partition), then a bounded per-block histogram partial
    folds through the small combiner.  Output: ``n_turns, n_convs``."""
    from ..functions.groupagg import lowcard_groupagg

    stats = conversation_stats(transcripts, num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["n_turns"]).group_by(["n_turns"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "n_turns": pc.cast(g["n_turns"], pa.int64()),
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    return lowcard_groupagg(
        stats.map_batches(partial, batch_format="pyarrow"),
        ["n_turns"], [("n", "sum")], {"n_sum": "n_convs"},
    )


# ---------------------------------------------------------------------------
# Conversation-structure dedup family: prefix/branch detection, tool-trace
# fingerprinting, and role-scoped dedup.  All three share the same two-stage
# shape — ONE conv_id-keyed partition (per-conversation keys computed
# block-locally over whole conversations, the assemble discipline) followed
# by ONE key-keyed partition for the global group census — so each op costs
# exactly two bounded exchanges at any corpus size.  Reference analogue: the
# per-video frame-sequence grouping of ndd/extract_images.py:61 generalized
# to turn sequences.
# ---------------------------------------------------------------------------

_SEP = "\x1f"  # turn separator inside per-conversation fingerprint keys;
# matches chr(31) in the SQL oracles (cannot appear in whitespace-split
# tokens only by convention — both sides use the identical join, so parity
# holds even if a pathological token contained it)


def _conv_fingerprint_table(t: pa.Table, k: int | None,
                            asst_only: bool) -> tuple:
    """Per-conversation (key_fp, full_fp, conv_id) Arrow arrays from one
    conv-keyed hash partition: sort by (conv_id, turn_idx), md5 the
    SEP-joined turn texts.

    ``k``: fingerprint only the first k turns (convs shorter than k drop);
    ``asst_only`` (k=None): fingerprint only assistant turns (convs with
    none drop).  ``full_fp`` is always the whole-conversation fingerprint,
    so the caller can count distinct continuations/user-sides per group.
    Fully Arrow-native (round 5 — the assemble-stage idiom): zero-copy
    LargeListArray wraps + ONE binary_join kernel per fingerprint basis,
    buffer-sliced md5; large offsets so a giant partition can't overflow."""
    import numpy as np

    from ..functions.hashing import md5_hex_column
    from ..stages.assemble import group_offsets

    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv = t["conv_id"].combine_chunks()
    text = pc.cast(t["text"].combine_chunks(), pa.large_string())
    offsets = group_offsets(conv)
    starts, counts = offsets[:-1], np.diff(offsets)
    sep = pa.scalar(_SEP, pa.large_string())
    full = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), text), sep
    )
    cids = conv.take(pa.array(starts, pa.int64()))
    if k is not None:
        keep = counts >= k
        ks = starts[keep]
        idx = (ks[:, None] + np.arange(k)[None, :]).reshape(-1)
        key = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(np.arange(len(ks) + 1, dtype=np.int64) * k, pa.int64()),
                text.take(pa.array(idx, pa.int64())),
            ),
            sep,
        )
        full = full.filter(pa.array(keep))
        cids = cids.filter(pa.array(keep))
    else:
        sub = t.filter(pc.equal(t["role"], "assistant"))  # keeps the sort
        sconv = sub["conv_id"].combine_chunks()
        stext = pc.cast(sub["text"].combine_chunks(), pa.large_string())
        soff = group_offsets(sconv)
        key = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(soff, pa.int64()), stext),
            sep,
        )
        skeys = sconv.take(pa.array(soff[:-1], pa.int64()))
        # align full/cids to the convs that HAVE assistant turns: both key
        # arrays are ascending (sorted partition), so one searchsorted maps
        # each assistant-conv to its full-fingerprint row
        pos = np.searchsorted(
            cids.to_numpy(zero_copy_only=False),
            skeys.to_numpy(zero_copy_only=False),
        )
        full = full.take(pa.array(pos, pa.int64()))
        cids = skeys
    return md5_hex_column(key), md5_hex_column(full), cids


_GROUP_SCHEMA_COLS = [("n_convs", pa.int64()), ("n_variants", pa.int64()),
                      ("rep_conv", pa.string())]


def _group_census(pairs, key_col: str, num_partitions: int | None):
    """Stage 2 shared by the family: ONE keyed partition on the fingerprint,
    block-local count / count_distinct(full_fp) / min(conv_id); only groups
    with >= 2 conversations survive."""
    from ..state.partitioning import key_partitioned

    schema = pa.schema([(key_col, pa.string())] + _GROUP_SCHEMA_COLS)

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=schema)
        a = t.group_by([key_col]).aggregate(
            [("full_fp", "count_distinct"), ("conv_id", "min"), ([], "count_all")]
        )
        out = pa.table(
            {
                key_col: a[key_col],
                "n_convs": pc.cast(a["count_all"], pa.int64()),
                "n_variants": pc.cast(a["full_fp_count_distinct"], pa.int64()),
                "rep_conv": a["conv_id_min"],
            },
            schema=schema,
        )
        return out.filter(pc.greater_equal(out["n_convs"], 2))

    return key_partitioned(pairs, [key_col], num_partitions).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def conv_branch_groups(transcripts, k: int = 3,
                       num_partitions: int | None = None):
    """BRANCH/RETRY detection: groups of conversations sharing an identical
    first-``k``-turn prefix — the agent-log pattern where one session was
    retried, forked, or continued from a common opening.  ``n_variants``
    counts the distinct full conversations behind the shared prefix (1 means
    the group is pure exact copies; >1 means genuine branching worth a
    dedup-to-branch-point pass).  Output: ``prefix_fp, n_convs, n_variants,
    rep_conv`` for groups of >= 2 convs with >= k turns."""
    from ..state.partitioning import key_partitioned

    ds = transcripts.select_columns(["conv_id", "turn_idx", "text"])
    schema = pa.schema([("prefix_fp", pa.string()), ("full_fp", pa.string()),
                        ("conv_id", pa.string())])

    def per_conv(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=schema)
        keys, fulls, cids = _conv_fingerprint_table(t, k, False)
        return pa.table(
            {"prefix_fp": keys, "full_fp": fulls, "conv_id": cids},
            schema=schema,
        )

    pairs = key_partitioned(ds, ["conv_id"], num_partitions).map_batches(
        per_conv, batch_format="pyarrow", batch_size=None
    )
    return _group_census(pairs, "prefix_fp", num_partitions)


def tool_sequence_dups(transcripts, num_partitions: int | None = None):
    """BEHAVIORAL fingerprint dedup: groups of conversations with the
    identical ordered tool-call trace (assistant turns' ``tool`` values,
    empty slots preserved) — the transcript-domain analogue of call-graph
    dedup: agent sessions that did the same thing, whatever they said.
    ``n_variants`` counts distinct full conversations per trace (n_convs >
    n_variants means exact copies inflate the group).  Output: ``tool_seq,
    n_convs, n_variants, rep_conv`` for groups of >= 2 convs with >= 1
    assistant turn."""
    from ..state.partitioning import key_partitioned

    ds = transcripts.select_columns(["conv_id", "turn_idx", "role", "text", "tool"])
    schema = pa.schema([("tool_seq", pa.string()), ("full_fp", pa.string()),
                        ("conv_id", pa.string())])

    def per_conv(t: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.hashing import md5_hex_column
        from ..stages.assemble import group_offsets

        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=schema)
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        conv = t["conv_id"].combine_chunks()
        text = pc.cast(t["text"].combine_chunks(), pa.large_string())
        off = group_offsets(conv)
        full = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(off, pa.int64()), text),
            pa.scalar(_SEP, pa.large_string()),
        )
        cids = conv.take(pa.array(off[:-1], pa.int64()))
        sub = t.filter(pc.equal(t["role"], "assistant"))
        sconv = sub["conv_id"].combine_chunks()
        stool = pc.cast(sub["tool"].combine_chunks(), pa.large_string())
        soff = group_offsets(sconv)
        seq = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(soff, pa.int64()), stool),
            pa.scalar(">", pa.large_string()),
        )
        skeys = sconv.take(pa.array(soff[:-1], pa.int64()))
        pos = np.searchsorted(
            cids.to_numpy(zero_copy_only=False),
            skeys.to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {"tool_seq": pc.cast(seq, pa.string()),
             "full_fp": md5_hex_column(full.take(pa.array(pos, pa.int64()))),
             "conv_id": skeys},
            schema=schema,
        )

    pairs = key_partitioned(ds, ["conv_id"], num_partitions).map_batches(
        per_conv, batch_format="pyarrow", batch_size=None
    )
    return _group_census(pairs, "tool_seq", num_partitions)


def assistant_near_dup_convs(transcripts, n: int = 3, tau: float = 0.8,
                             num_partitions: int | None = None):
    """FUZZY role-scoped dedup: conversation pairs whose ASSISTANT-side text
    alone (turn-ordered, normalized) has token-``n``-gram Jaccard >= ``tau``
    — near-identical model completions answering different or lightly-edited
    prompts, which ``assistant_dup_convs``'s exact fingerprint census misses
    the moment one assistant token differs.

    One conv_id-keyed shuffle assembles each conversation's assistant text
    block-locally (one Python join PER CONVERSATION, same granularity as the
    assemble stage), then the exact prefix-filter Jaccard join
    (``docs_dedup.ngram_jaccard_join``) runs over the assistant-texts corpus.
    Output: (a, b, jaccard) conv-id pairs, a < b."""
    import numpy as np

    from ..state.partitioning import key_partitioned, materialize_clean
    from .docs_dedup import ngram_grams_over, ngram_jaccard_join

    ds = transcripts.select_columns(["conv_id", "turn_idx", "role", "text"])
    schema = pa.schema([("conv_id", pa.string()), ("doc_text", pa.string())])

    def assistant_text_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=schema)
        t = t.filter(pc.equal(t["role"], "assistant"))
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=schema)
        conv = t["conv_id"].combine_chunks()
        enc = conv.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tix = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tix, codes))
        texts = pc.utf8_lower(t["text"]).take(pa.array(order)).to_pylist()
        co = codes[order]
        starts = np.flatnonzero(np.concatenate(([True], co[1:] != co[:-1])))
        bounds = np.append(starts, len(co))
        cids = enc.dictionary.take(pa.array(co[starts])).to_pylist()
        joined = [
            " ".join(texts[bounds[i]: bounds[i + 1]]) for i in range(len(starts))
        ]
        return pa.table(
            {"conv_id": pa.array(cids, pa.string()),
             "doc_text": pa.array(joined, pa.string())},
            schema=schema,
        )

    docs = key_partitioned(ds, ["conv_id"], num_partitions).map_batches(
        assistant_text_block, batch_format="pyarrow", batch_size=None
    )
    sigs = materialize_clean(ngram_grams_over(docs, n))
    return ngram_jaccard_join(sigs, tau=tau, int_ids=False)


def assistant_dup_convs(transcripts, num_partitions: int | None = None):
    """ROLE-SCOPED dedup: groups of conversations identical on the
    assistant-side text alone (turn-ordered), however the user side differs —
    canned/templated assistant responses that whole-conversation exact dedup
    misses whenever any user turn varies.  ``n_variants`` > 1 flags groups
    where the same completions answered different prompts.  Output:
    ``asst_fp, n_convs, n_variants, rep_conv`` for groups of >= 2 convs with
    >= 1 assistant turn."""
    from ..state.partitioning import key_partitioned

    ds = transcripts.select_columns(["conv_id", "turn_idx", "role", "text"])
    schema = pa.schema([("asst_fp", pa.string()), ("full_fp", pa.string()),
                        ("conv_id", pa.string())])

    def per_conv(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=schema)
        keys, fulls, cids = _conv_fingerprint_table(t, None, True)
        return pa.table(
            {"asst_fp": keys, "full_fp": fulls, "conv_id": cids},
            schema=schema,
        )

    pairs = key_partitioned(ds, ["conv_id"], num_partitions).map_batches(
        per_conv, batch_format="pyarrow", batch_size=None
    )
    return _group_census(pairs, "asst_fp", num_partitions)


def turn_burst_dedup(transcripts, ttl_seconds: int = 60,
                     num_partitions: int | None = None):
    """STREAMING-dedup analogue (SURVEY §2.9): TTL/burst suppression of
    repeated turn texts.  Occurrences of an identical turn text are scanned
    in time order; one occurrence within ``ttl_seconds`` of its predecessor
    is SUPPRESSED (cache hit), a gap greater than the TTL starts a new BURST
    (cache expiry -> the text is kept again).  This is the dedup-with-TTL
    primitive of a streaming ingest pipeline: ``n_bursts`` is what survives,
    ``n_suppressed`` is the redundancy removed by a TTL cache of that size.

    ONE text-keyed hash partition co-locates every occurrence; the
    block-local scan is a vectorized diff over the (text, ts)-sorted block —
    burst counts are order-invariant under ts ties (gap 0 is always a
    suppression), so no cross-partition state is needed at any scale.
    Output: ``turn_text, n_occurrences, n_bursts, n_suppressed`` for texts
    seen >= 2 times."""
    import numpy as np

    from ..state.partitioning import key_partitioned

    ttl_us = int(ttl_seconds) * 1_000_000
    ds = transcripts.select_columns(["text", "ts"]).map_batches(
        lambda t: t.filter(pc.not_equal(t["text"], "")), batch_format="pyarrow"
    )
    schema = pa.schema(
        [("turn_text", pa.string()), ("n_occurrences", pa.int64()),
         ("n_bursts", pa.int64()), ("n_suppressed", pa.int64())]
    )

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=schema)
        enc = t["text"].combine_chunks().dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False) \
                    .astype("datetime64[us]").view(np.int64)
        order = np.lexsort((ts, code))
        code, ts = code[order], ts[order]
        new_text = np.r_[True, code[1:] != code[:-1]]
        burst = new_text | np.r_[False, (ts[1:] - ts[:-1]) > ttl_us]
        starts = np.flatnonzero(new_text)
        n_occ = np.diff(np.r_[starts, code.size])
        n_bursts = np.add.reduceat(burst.astype(np.int64), starts)
        keep = n_occ >= 2
        texts = enc.dictionary.take(pa.array(code[starts][keep]))
        return pa.table(
            {"turn_text": texts,
             "n_occurrences": pa.array(n_occ[keep], pa.int64()),
             "n_bursts": pa.array(n_bursts[keep], pa.int64()),
             "n_suppressed": pa.array(n_occ[keep] - n_bursts[keep], pa.int64())},
            schema=schema,
        )

    return key_partitioned(ds, ["text"], num_partitions).map_batches(
        block, batch_format="pyarrow", batch_size=None
    )


def conv_prefix_dups(transcripts, num_partitions: int | None = None):
    """TRUNCATION/CONTINUATION dedup: pairs ``(a, b)`` where conversation
    ``a``'s full turn-text sequence equals the first ``n_a`` turns of a
    LONGER conversation ``b`` — the "session cut short / resumed later"
    pattern that exact dedup (different lengths) and near-dup (Jaccard
    diluted by ``b``'s tail) both miss.  Reference analogue: the shot-prefix
    reuse a video near-dup system sees when one upload truncates another.

    Plan (all keyed, streams at 100 TB):

    1. ONE conv_id-keyed partition; per conversation a CHAINED md5 over the
       turn texts yields one 128-bit prefix hash per turn boundary — the
       emission is O(total turns), never O(turns^2) text.
    2. The per-conv FULL hash (position = n_turns) probes the proper-prefix
       hash index (position < n_turns) with ONE keyed equi-join on
       ``(hash, position)`` — no text ever re-shuffles.

    128-bit chain collisions are the only approximation (~2^-128 per
    candidate; the same trust the exact-dedup md5 fingerprint already
    carries).  Empty turn texts are treated as absent (corpus-derivation
    ``has_tokens`` parity).  Turn order is (conv_id, turn_idx) — never block
    order.  Output: ``a, b, n_shared_turns, b_n_turns``."""
    import hashlib

    from ..state.partitioning import key_partitioned, resolve_partitions

    num_partitions = resolve_partitions(num_partitions)
    ds = transcripts.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        lambda t: t.filter(pc.not_equal(t["text"], "")), batch_format="pyarrow"
    )
    schema = pa.schema(
        [("h", pa.string()), ("conv_id", pa.string()),
         ("pos", pa.int32()), ("n_total", pa.int32())]
    )

    def per_conv(df) -> pa.Table:
        if df.empty:
            return pa.Table.from_pylist([], schema=schema)
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        hs: list[str] = []
        cids: list[str] = []
        poss: list[int] = []
        ns: list[int] = []
        for cid, g in df.groupby("conv_id", sort=True)["text"]:
            texts = g.to_numpy()
            n = len(texts)
            h = b""
            for k, t in enumerate(texts):
                h = hashlib.md5(h + b"\x1f" + t.encode()).digest()
                hs.append(h.hex())
                cids.append(cid)
                poss.append(k + 1)
                ns.append(n)
        return pa.table(
            {"h": pa.array(hs, pa.string()),
             "conv_id": pa.array(cids, pa.string()),
             "pos": pa.array(poss, pa.int32()),
             "n_total": pa.array(ns, pa.int32())},
            schema=schema,
        )

    hashed = key_partitioned(ds, ["conv_id"], num_partitions).map_batches(
        per_conv, batch_format="pandas", batch_size=None
    )
    probes = hashed.map_batches(
        lambda t: t.filter(pc.equal(t["pos"], t["n_total"]))
                   .select(["h", "pos", "conv_id"]),
        batch_format="pyarrow",
    )
    index = hashed.map_batches(
        lambda t: t.filter(pc.less(t["pos"], t["n_total"]))
                   .rename_columns(["h", "conv_id_b", "pos", "n_total"]),
        batch_format="pyarrow",
    )
    j = probes.join(
        index,
        join_type="inner",
        num_partitions=num_partitions,
        on=("h", "pos"),
    )
    out_schema = pa.schema(
        [("a", pa.string()), ("b", pa.string()),
         ("n_shared_turns", pa.int32()), ("b_n_turns", pa.int32())]
    )

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        return pa.table(
            {"a": t["conv_id"], "b": t["conv_id_b"],
             "n_shared_turns": t["pos"], "b_n_turns": t["n_total"]},
            schema=out_schema,
        )

    return j.map_batches(project, batch_format="pyarrow")


def shuffled_dup_convs(transcripts, num_partitions: int | None = None):
    """ORDER-INSENSITIVE conversation dedup: groups of conversations whose
    turn-text MULTISET is identical — catches reordered/rotated copies of a
    dialogue (log re-serialization, retry interleaving) that every ordered
    fingerprint misses.  ``n_orderings`` counts the distinct ORDERED variants
    inside the group (1 = the group is pure exact copies; >1 = genuinely
    shuffled duplicates worth an order-canonicalization pass).

    Two keyed shuffles: conv_id-keyed partition for per-conversation
    fingerprints (ordered md5 + sorted-turn md5, block-local), then a
    multiset-fp-keyed group census.  Turn texts must not contain the \\x1f
    separator (guaranteed by the corpus derivation); empty turn texts are
    treated as absent.  Output: ``rep_id, n_convs, n_orderings`` for groups
    of >= 2 conversations."""
    import hashlib

    from ..state.partitioning import key_partitioned

    ds = transcripts.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        lambda t: t.filter(pc.not_equal(t["text"], "")), batch_format="pyarrow"
    )
    fp_schema = pa.schema(
        [("mfp", pa.string()), ("ofp", pa.string()), ("conv_id", pa.string())]
    )

    def per_conv(t: pa.Table) -> pa.Table:
        # two sorts of the same block — (conv, turn_idx) for the ordered
        # basis, (conv, text) for the multiset basis (Arrow's bytewise
        # string sort equals Python's codepoint sort under UTF-8) — then
        # the shared group-offset + binary_join + buffer-md5 idiom
        from ..functions.hashing import md5_hex_column
        from ..stages.assemble import group_offsets

        if t.num_rows == 0:
            return pa.Table.from_pylist([], schema=fp_schema)
        sep = pa.scalar(_SEP, pa.large_string())

        def joined(tbl: pa.Table):
            conv = tbl["conv_id"].combine_chunks()
            text = pc.cast(tbl["text"].combine_chunks(), pa.large_string())
            off = group_offsets(conv)
            j = pc.binary_join(
                pa.LargeListArray.from_arrays(pa.array(off, pa.int64()), text),
                sep,
            )
            return j, conv.take(pa.array(off[:-1], pa.int64()))

        ordered, cids = joined(
            t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        )
        mset, _ = joined(
            t.sort_by([("conv_id", "ascending"), ("text", "ascending")])
        )
        return pa.table(
            {"mfp": md5_hex_column(mset),
             "ofp": md5_hex_column(ordered),
             "conv_id": cids},
            schema=fp_schema,
        )

    fps = key_partitioned(ds, ["conv_id"], num_partitions).map_batches(
        per_conv, batch_format="pyarrow", batch_size=None
    )
    out_schema = pa.schema(
        [("rep_id", pa.string()), ("n_convs", pa.int64()),
         ("n_orderings", pa.int64())]
    )

    def census(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        a = t.group_by(["mfp"]).aggregate(
            [("ofp", "count_distinct"), ("conv_id", "min"), ([], "count_all")]
        )
        out = pa.table(
            {"rep_id": a["conv_id_min"],
             "n_convs": pc.cast(a["count_all"], pa.int64()),
             "n_orderings": pc.cast(a["ofp_count_distinct"], pa.int64())},
            schema=out_schema,
        )
        return out.filter(pc.greater_equal(out["n_convs"], 2))

    return key_partitioned(fps, ["mfp"], num_partitions).map_batches(
        census, batch_format="pyarrow", batch_size=None
    )
