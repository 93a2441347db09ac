"""The ``transcripts`` input table (BASELINE.json input_hint):

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Two deterministic producers, no external data:

1. ``synth_corpus`` — seeded synthetic corpus with PLANTED dup families and a
   ground-truth sidecar (FIXTURES.md §F1) for unit/e2e tests.
2. ``transcripts_from_documents`` — streaming, row-local derivation from the
   driver's ``documents.parquet`` (doc -> conversation; token chunks -> turns;
   deterministic dup planting keyed on doc_id) used by ``entry()``/``bench.py``
   so benchmarks run on driver-provided data at any scale factor.

Reference analogue: the per-video directory of frames keyed by ms timestamp
(``ndd/extract_images.py:61``) — here turns keyed by ``(conv_id, turn_idx)``.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa

TRANSCRIPTS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_EPOCH = datetime.datetime(2026, 1, 1)
_ROLES = ["user", "assistant"]
_TOOLS = ["", "", "", "search", "python", "browser"]


def _vocab(rng: np.random.Generator, size: int = 600) -> list[str]:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = set()
    while len(words) < size:
        n = int(rng.integers(3, 9))
        words.add("".join(rng.choice(letters, size=n)))
    return sorted(words)


def _turn_text(rng: np.random.Generator, vocab: list[str], n_tokens: int) -> str:
    return " ".join(vocab[i] for i in rng.integers(0, len(vocab), size=n_tokens))


def synth_corpus(
    n_unique: int = 60,
    n_exact: int = 15,
    n_near: int = 15,
    n_shuffled: int = 8,
    n_substring: int = 8,
    n_boilerplate: int = 30,
    n_degenerate: int = 6,
    seed: int = 42,
) -> tuple[pa.Table, pa.Table]:
    """Deterministic transcripts + truth sidecar (conv_id, family_id, kind).

    Families (FIXTURES.md §F1): exact copies, ~2% token-edit near-dups,
    turn-shuffled copies, substring containment, boilerplate-skewed shared
    preambles (the hot-LSH-bucket driver), degenerate empty/1-turn convs, and
    unique background.  The engine never reads the sidecar.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    rows: list[tuple] = []  # (conv_id, turn_idx, role, text, tool)
    truth: list[tuple[str, str, str]] = []

    convs: dict[str, list[str]] = {}

    def add_conv(conv_id: str, turns: list[str], family: str, kind: str) -> None:
        convs[conv_id] = turns
        truth.append((conv_id, family, kind))
        for i, text in enumerate(turns):
            role = _ROLES[i % 2]
            tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "assistant" else ""
            rows.append((conv_id, i, role, text, tool))

    base_ids = []
    for u in range(n_unique):
        cid = f"u{u:05d}"
        turns = [
            _turn_text(rng, vocab, int(rng.integers(12, 40)))
            for _ in range(int(rng.integers(2, 10)))
        ]
        add_conv(cid, turns, f"fam_u{u:05d}", "unique")
        base_ids.append(cid)

    for e in range(n_exact):
        src = base_ids[e % len(base_ids)]
        add_conv(f"x{e:05d}", list(convs[src]), f"fam_{src}", "exact")

    for m in range(n_near):
        src = base_ids[(m * 3 + 1) % len(base_ids)]
        turn_toks = [t.split(" ") for t in convs[src]]
        total = sum(len(tt) for tt in turn_toks)
        # ~1 edit per 120 tokens: each edit destroys ~shingle_w shingles, so
        # this keeps Jaccard comfortably above tau=0.8.
        for _ in range(max(1, total // 120)):
            ti = int(rng.integers(0, len(turn_toks)))
            pos = int(rng.integers(0, len(turn_toks[ti])))
            turn_toks[ti][pos] = vocab[int(rng.integers(0, len(vocab)))]
        add_conv(f"n{m:05d}", [" ".join(tt) for tt in turn_toks], f"fam_{src}", "near-edit")

    for s in range(n_shuffled):
        src = base_ids[(s * 5 + 2) % len(base_ids)]
        perm = rng.permutation(len(convs[src]))
        add_conv(f"s{s:05d}", [convs[src][p] for p in perm], f"fam_{src}", "turn-shuffled")

    for s in range(n_substring):
        src = base_ids[(s * 7 + 3) % len(base_ids)]
        extra = [
            _turn_text(rng, vocab, int(rng.integers(12, 30)))
            for _ in range(int(rng.integers(3, 6)))
        ]
        add_conv(f"c{s:05d}", list(convs[src]) + extra, f"fam_{src}", "substring")

    preamble = _turn_text(rng, vocab, 60)  # identical tool preamble shared by many convs
    for b in range(n_boilerplate):
        tail = [_turn_text(rng, vocab, int(rng.integers(4, 10)))]
        add_conv(f"b{b:05d}", [preamble] + tail, "fam_boiler", "boilerplate-skew")

    for d in range(n_degenerate):
        if d % 3 == 0:
            turns = [""]
        elif d % 3 == 1:
            turns = ["   \t  "]
        else:
            turns = [vocab[d]]
        add_conv(f"d{d:05d}", turns, f"fam_d{d % 3}", "degenerate")

    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for conv_id, turn_idx, role, text, tool in rows:
        conv_ids.append(conv_id)
        turn_idxs.append(turn_idx)
        roles.append(role)
        texts.append(text)
        tools.append(tool)
        tss.append(_EPOCH + datetime.timedelta(seconds=len(conv_ids), milliseconds=turn_idx))

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )
    truth_table = pa.table(
        {
            "conv_id": pa.array([t[0] for t in truth], pa.string()),
            "family_id": pa.array([t[1] for t in truth], pa.string()),
            "kind": pa.array([t[2] for t in truth], pa.string()),
        }
    )
    return transcripts, truth_table


def corpus_docs(transcripts: pa.Table) -> dict[str, str]:
    """Driver-side assembly of conv_id -> document text (turns sorted by
    turn_idx, joined with newline) — the oracle-side mirror of the engine's
    assemble stage.  Small-data only."""
    t = transcripts.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    docs: dict[str, list[str]] = {}
    for conv_id, text in zip(t["conv_id"].to_pylist(), t["text"].to_pylist()):
        docs.setdefault(conv_id, []).append(text)
    return {k: "\n".join(v) for k, v in docs.items()}


# ---------------------------------------------------------------------------
# Derivation from the driver's documents.parquet (row-local => streams at scale)
# ---------------------------------------------------------------------------

TURN_TOKENS = 30  # tokens per synthetic turn


def docs_to_transcript_batch(batch: pa.Table) -> pa.Table:
    """Row-local doc -> turns expansion with deterministic dup planting:

    - every doc becomes conversation ``doc<doc_id>`` with ~n_tokens/30 turns;
    - docs with ``doc_id % 10 == 7`` also emit an EXACT duplicate conversation
      (suffix ``e``);
    - docs with ``doc_id % 10 == 3`` also emit a NEAR duplicate (suffix ``m``,
      every 29th token replaced) — Jaccard well above 0.8 for typical docs.

    Pure function of the row => independent of batch/block boundaries.
    """
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}

    def emit(conv_id: str, tokens: list[str], doc_id: int) -> None:
        n = max(1, (len(tokens) + TURN_TOKENS - 1) // TURN_TOKENS)
        for i in range(n):
            chunk = tokens[i * TURN_TOKENS : (i + 1) * TURN_TOKENS]
            out["conv_id"].append(conv_id)
            out["turn_idx"].append(i)
            out["role"].append(_ROLES[i % 2])
            out["text"].append(" ".join(chunk))
            out["tool"].append(_TOOLS[(doc_id + i) % len(_TOOLS)] if i % 2 == 1 else "")
            out["ts"].append(_EPOCH + datetime.timedelta(seconds=doc_id, milliseconds=i))

    for doc_id, text in zip(doc_ids, texts):
        tokens = text.split()
        cid = f"doc{doc_id:09d}"
        emit(cid, tokens, doc_id)
        if doc_id % 10 == 7:
            emit(cid + "e", tokens, doc_id)
        if doc_id % 10 == 3:
            edited = list(tokens)
            for pos in range(28, len(edited), 29):
                edited[pos] = f"tok{doc_id}"
            emit(cid + "m", edited, doc_id)

    return pa.table(
        {
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            "role": pa.array(out["role"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "tool": pa.array(out["tool"], pa.string()),
            "ts": pa.array(out["ts"], pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def transcripts_from_documents(sf_dir: str):
    """Streaming Dataset of transcripts derived from ``{sf_dir}/documents.parquet``
    (columns pruned at the read)."""
    from .io import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(docs_to_transcript_batch, batch_format="pyarrow")


def docs_to_planted_batch(batch: pa.Table) -> pa.Table:
    """Row-local doc -> turns expansion with TWO extra planted dup families on
    top of :func:`docs_to_transcript_batch` semantics (base + 'e' exact +
    'm' near variants are emitted identically):

    - docs with ``doc_id % 10 == 5`` and >= 2 turns also emit a TRUNCATED
      copy (suffix ``t``): the first ``(n + 1) // 2`` turns — a proper
      turn-boundary prefix (the "session cut short / continued later"
      pattern that whole-conversation dedup misses);
    - docs with ``doc_id % 10 == 1`` and >= 2 turns also emit a ROTATED copy
      (suffix ``s``): turn ``j`` of the copy is base turn ``(j + 1) % n`` —
      same turn-text multiset, different order (the reordered-log pattern
      that ordered fingerprints miss).

    Pure function of the row => independent of batch/block boundaries; used
    by the ``conv_prefix_dups`` / ``shuffled_dup_convs`` queries so their
    planted families exist at every scale factor."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}

    def emit(conv_id: str, chunks: list[str], doc_id: int) -> None:
        for i, chunk in enumerate(chunks):
            out["conv_id"].append(conv_id)
            out["turn_idx"].append(i)
            out["role"].append(_ROLES[i % 2])
            out["text"].append(chunk)
            out["tool"].append(_TOOLS[(doc_id + i) % len(_TOOLS)] if i % 2 == 1 else "")
            out["ts"].append(_EPOCH + datetime.timedelta(seconds=doc_id, milliseconds=i))

    for doc_id, text in zip(doc_ids, texts):
        tokens = text.split()
        n = max(1, (len(tokens) + TURN_TOKENS - 1) // TURN_TOKENS)
        chunks = [
            " ".join(tokens[i * TURN_TOKENS : (i + 1) * TURN_TOKENS])
            for i in range(n)
        ]
        cid = f"doc{doc_id:09d}"
        emit(cid, chunks, doc_id)
        if doc_id % 10 == 7:
            emit(cid + "e", chunks, doc_id)
        if doc_id % 10 == 3:
            edited = list(tokens)
            for pos in range(28, len(edited), 29):
                edited[pos] = f"tok{doc_id}"
            emit(
                cid + "m",
                [" ".join(edited[i * TURN_TOKENS : (i + 1) * TURN_TOKENS])
                 for i in range(n)],
                doc_id,
            )
        if doc_id % 10 == 5 and n >= 2:
            emit(cid + "t", chunks[: (n + 1) // 2], doc_id)
        if doc_id % 10 == 1 and n >= 2:
            emit(cid + "s", chunks[1:] + chunks[:1], doc_id)

    return pa.table(
        {
            "conv_id": pa.array(out["conv_id"], pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            "role": pa.array(out["role"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "tool": pa.array(out["tool"], pa.string()),
            "ts": pa.array(out["ts"], pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def planted_transcripts(sf_dir: str):
    """Streaming transcripts Dataset with the truncation/rotation planted
    families (see :func:`docs_to_planted_batch`)."""
    from .io import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(docs_to_planted_batch, batch_format="pyarrow")


def make_bench_expander(reps: int):
    """Row-local doc -> transcripts expansion at bench scale: each doc yields
    ``reps`` perturbed conversation variants.  Every 4TH token is made
    rep-specific: with shingle width 5 every window contains a perturbed
    token, so cross-rep shingle sets are DISJOINT (Jaccard ~0) and reps
    neither band-collide nor share anchors — without this, a 0.33 cross-rep
    Jaccard still band-collides ~32% of pairs at 32x4 and floods verify with
    doomed candidates (measured).  Each variant keeps its own planted
    exact/near dups per ``docs_to_transcript_batch`` semantics.
    Deterministic, row-local, streams at any scale."""

    def expand(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}

        def emit(conv_id: str, tokens: list[str], doc_id: int) -> None:
            n = max(1, (len(tokens) + TURN_TOKENS - 1) // TURN_TOKENS)
            for i in range(n):
                chunk = tokens[i * TURN_TOKENS : (i + 1) * TURN_TOKENS]
                out["conv_id"].append(conv_id)
                out["turn_idx"].append(i)
                out["role"].append(_ROLES[i % 2])
                out["text"].append(" ".join(chunk))
                out["tool"].append(_TOOLS[(doc_id + i) % len(_TOOLS)] if i % 2 == 1 else "")
                out["ts"].append(_EPOCH + datetime.timedelta(seconds=doc_id, milliseconds=i))

        for doc_id, text in zip(doc_ids, texts):
            base = text.split()
            for rep in range(reps):
                tokens = list(base)
                for pos in range(3, len(tokens), 4):
                    tokens[pos] = f"r{rep}p{pos}"
                cid = f"doc{doc_id:09d}r{rep}"
                emit(cid, tokens, doc_id)
                if doc_id % 10 == 7:
                    emit(cid + "e", tokens, doc_id)          # exact dup
                if doc_id % 10 == 3:
                    edited = list(tokens)
                    for pos in range(28, len(edited), 29):
                        edited[pos] = f"tok{doc_id}"
                    emit(cid + "m", edited, doc_id)          # near dup

        return pa.table(
            {
                "conv_id": pa.array(out["conv_id"], pa.string()),
                "turn_idx": pa.array(out["turn_idx"], pa.int32()),
                "role": pa.array(out["role"], pa.string()),
                "text": pa.array(out["text"], pa.string()),
                "tool": pa.array(out["tool"], pa.string()),
                "ts": pa.array(out["ts"], pa.timestamp("us")),
            },
            schema=TRANSCRIPTS_SCHEMA,
        )

    return expand


def bench_transcripts(sf_dir: str, reps: int = 6):
    """Streaming bench-scale transcripts Dataset derived from documents.

    The single-file parquet source yields one block; repartition the (tiny)
    doc table first so the row-local expansion parallelizes across the
    cluster instead of running in one task."""
    from ..state.partitioning import default_partitions
    from .io import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.repartition(default_partitions()).map_batches(
        make_bench_expander(reps), batch_format="pyarrow"
    )
