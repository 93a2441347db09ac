"""qa_pair_dups semantics: role-aware adjacency, cross-conversation
requirement, turn_idx contiguity, and block-boundary independence."""

import pyarrow as pa
import ray.data as rd

import near_duplicate_detection_ray  # noqa: F401  (enables hash shuffle before datasets are built)


def _transcripts(rows, blocks=1):
    """rows: (conv_id, turn_idx, role, text)."""
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
        }
    )
    if blocks == 1:
        return rd.from_arrow(t)
    step = max(1, len(rows) // blocks)
    return rd.from_arrow([t.slice(i, step) for i in range(0, len(rows), step)])


def _run(ds):
    from near_duplicate_detection_ray.pipelines.dedup import qa_pair_dups

    out = qa_pair_dups(ds).to_pandas()
    return sorted(map(tuple, out.itertuples(index=False)))


def _conv(cid, exchanges, start=0):
    rows = []
    for i, (q, a) in enumerate(exchanges):
        rows.append((cid, start + 2 * i, "user", q))
        rows.append((cid, start + 2 * i + 1, "assistant", a))
    return rows


def test_repeated_exchange_found_across_conversations(ray_session):
    rows = (
        _conv("A", [("how do i sort", "use sorted()"), ("thanks", "np")])
        + _conv("B", [("how do i sort", "use sorted()"), ("other", "reply")])
        + _conv("C", [("unique q", "unique a")])
    )
    assert _run(_transcripts(rows)) == [("how do i sort", "use sorted()", 2, 2)]


def test_same_conv_repeat_alone_is_not_cross_conv(ray_session):
    # the exchange repeats twice inside A only -> n_convs = 1 -> excluded
    rows = _conv("A", [("q", "a"), ("q", "a")])
    assert _run(_transcripts(rows)) == []


def test_same_conv_repeats_counted_in_occurrences(ray_session):
    # A holds the exchange twice, B once: 3 occurrences over 2 convs
    rows = _conv("A", [("q", "a"), ("q", "a")]) + _conv("B", [("q", "a")])
    assert _run(_transcripts(rows)) == [("q", "a", 3, 2)]


def test_role_order_matters(ray_session):
    # assistant-then-user adjacency is NOT an exchange
    rows = [
        ("A", 0, "assistant", "a"), ("A", 1, "user", "q"),
        ("B", 0, "assistant", "a"), ("B", 1, "user", "q"),
    ]
    assert _run(_transcripts(rows)) == []


def test_gap_breaks_adjacency(ray_session):
    # user turn 0, assistant turn 2: not contiguous -> no pair
    rows = [
        ("A", 0, "user", "q"), ("A", 2, "assistant", "a"),
        ("B", 0, "user", "q"), ("B", 2, "assistant", "a"),
    ]
    assert _run(_transcripts(rows)) == []


def test_block_boundary_independence(ray_session):
    rows = (
        _conv("A", [("q1", "a1"), ("q2", "a2"), ("q3", "a3")])
        + _conv("B", [("q2", "a2"), ("q3", "a3")])
        + _conv("C", [("q3", "a3")])
    )
    expect = [("q2", "a2", 2, 2), ("q3", "a3", 3, 3)]
    assert _run(_transcripts(rows, blocks=1)) == expect
    assert _run(_transcripts(rows, blocks=5)) == expect


def test_near_dup_exchange_found_and_same_conv_excluded(ray_session):
    from near_duplicate_detection_ray.pipelines.dedup import qa_pair_near_dups

    base_q = "how do i sort a list of tuples by the second field in python"
    base_a = "use sorted with a key lambda taking the second element of each"
    edited_a = "use sorted with a key lambda taking the SECOND element of all"
    rows = (
        _conv("A", [(base_q, base_a)])
        + _conv("B", [(base_q, edited_a)])          # near-dup of A's exchange
        + _conv("C", [(base_q, base_a), (base_q, base_a)])  # self-repeat only
        + _conv("D", [("unrelated question entirely", "unrelated answer")])
    )
    out = qa_pair_near_dups(_transcripts(rows)).to_pandas()
    convs = {
        tuple(sorted((a.split("#")[0], b.split("#")[0])))
        for a, b in zip(out["a"], out["b"])
    }
    assert ("A", "B") in convs                      # fuzzy match found
    assert all(x != y for x, y in convs)            # never same-conv
    assert not any("D" in p for p in convs)         # unrelated stays out
