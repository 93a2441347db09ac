"""dup_turn_windows semantics: contiguity, cross-conversation requirement,
block-boundary independence, and duplicate-turn_idx resistance."""

import pyarrow as pa
import ray.data as rd

import near_duplicate_detection_ray  # noqa: F401  (enables hash shuffle before datasets are built)


def _transcripts(rows, blocks=1):
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([""] * len(rows), pa.string()),
        }
    )
    if blocks == 1:
        return rd.from_arrow(t)
    step = max(1, len(rows) // blocks)
    return rd.from_arrow([t.slice(i, step) for i in range(0, len(rows), step)])


def _run(ds):
    from near_duplicate_detection_ray.pipelines.dedup import dup_turn_windows

    out = dup_turn_windows(ds).to_pandas()
    return sorted(map(tuple, out.itertuples(index=False)))


def test_copied_subdialogue_found_across_conversations(ray_session):
    rows = (
        [("A", i, f"line{i}") for i in range(5)]
        # B copies A's turns 1..3 at its own offsets 0..2
        + [("B", j, f"line{j + 1}") for j in range(3)]
    )
    got = _run(_transcripts(rows))
    win = "line1\x1fline2\x1fline3"
    assert got == [(win, 2, 2)]


def test_non_contiguous_turns_make_no_window(ray_session):
    rows = [("A", i, f"line{i}") for i in range(3)] + [
        ("C", 0, "line0"), ("C", 2, "line1"), ("C", 4, "line2"),
    ]
    assert _run(_transcripts(rows)) == []


def test_duplicate_turn_idx_cannot_fake_contiguity(ray_session):
    # D has turn_idx (0, 0, 2): span 2 over 3 rows, but no step of exactly 1
    rows = [("A", i, f"line{i}") for i in range(3)] + [
        ("D", 0, "line0"), ("D", 0, "line1"), ("D", 2, "line2"),
    ]
    assert _run(_transcripts(rows)) == []


def test_block_boundary_independence(ray_session):
    rows = (
        [("A", i, f"line{i}") for i in range(6)]
        + [("B", j, f"line{j}") for j in range(6)]
    )
    one = _run(_transcripts(rows, blocks=1))
    many = _run(_transcripts(rows, blocks=5))
    assert one == many
    # 4 windows per conv, each shared by both convs
    assert len(one) == 4 and all(r[1:] == (2, 2) for r in one)


def test_within_conversation_repeat_is_not_cross_conv(ray_session):
    # the same 3-turn run twice INSIDE one conversation: n_convs == 1 -> out
    rows = [("A", i, f"line{i % 3}") for i in range(6)]
    assert _run(_transcripts(rows)) == []


def test_turn_window_near_dups_finds_edited_copy(ray_session):
    """A lightly-edited copied 3-turn exchange (one substituted token out of
    ~36) must surface as a near-dup window pair, while exact window dedup
    misses it; same-conversation overlapping windows must not pair."""
    from near_duplicate_detection_ray.pipelines.dedup import (
        dup_turn_windows,
        turn_window_near_dups,
    )

    base = [" ".join(f"tok{t}_{j}" for j in range(12)) for t in range(3)]
    edited = list(base)
    edited[1] = edited[1].replace("tok1_5", "CHANGED")
    rows = (
        [("A", i, base[i]) for i in range(3)]
        + [("B", i, edited[i]) for i in range(3)]
        # unrelated filler conversation
        + [("C", i, " ".join(f"x{i}_{j}" for j in range(12))) for i in range(3)]
    )
    ds = _transcripts(rows)
    near = turn_window_near_dups(ds).to_pandas()
    got = sorted(map(tuple, near[["a", "b"]].itertuples(index=False)))
    assert got == [("A#0", "B#0")]
    assert (near["jaccard"] >= 0.7).all() and (near["jaccard"] < 1.0).all()
    # the exact census can't see the edited copy
    assert dup_turn_windows(ds).count() == 0
