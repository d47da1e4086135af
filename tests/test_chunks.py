from olake_spark.plans.chunks import (
    Chunk,
    chunks_to_predicates,
    pack_file_groups,
    split_numeric_range,
    split_string_keyspace,
    walk_boundaries,
)


def test_numeric_split_covers_range():
    chunks = split_numeric_range(0, 14999, 8)
    assert chunks[0].min == 0
    assert chunks[-1].max is None
    # half-open contiguity
    for a, b in zip(chunks, chunks[1:]):
        assert a.max == b.min
    assert len(chunks) == 8


def test_numeric_split_degenerate():
    assert split_numeric_range(5, 5, 8) == [Chunk(5, None)]
    assert split_numeric_range(10, 5, 4) == []


def test_numeric_split_overflow_guard():
    hi = 2**63 - 2
    chunks = split_numeric_range(hi - 10, hi, 4)
    assert chunks[-1].max is None  # tail absorbed without overflowing


def test_walk_boundaries():
    keys = list(range(0, 100, 7))  # simulated boundary probe results

    def nxt(cur):
        later = [k for k in keys if k > cur]
        return later[0] if later else None

    chunks = walk_boundaries(0, nxt)
    assert chunks[0] == Chunk(0, 7)
    assert chunks[-1].max is None
    assert len(chunks) == len(keys)


def test_string_keyspace_split():
    chunks = split_string_keyspace("aaa", "zzz", 4)
    assert chunks[0].min == "aaa"
    assert chunks[-1].max is None
    bounds = [c.max for c in chunks[:-1]]
    assert bounds == sorted(bounds)
    assert all("aaa" < b < "zzz" for b in bounds)


def test_string_keyspace_align_merge():
    # aligner collapses every candidate to the same real key → single merge
    chunks = split_string_keyspace("aaa", "zzz", 4, align=lambda c: "mmm")
    assert [c.max for c in chunks[:-1]] == ["mmm"]


def test_pack_file_groups():
    files = [("a", 900), ("b", 600), ("c", 400), ("d", 2500), ("e", 100)]
    groups = pack_file_groups(files, target_bytes=1000)
    assert ["d"] in groups  # oversized goes solo
    total = sorted(p for g in groups for p in g)
    assert total == ["a", "b", "c", "d", "e"]


def test_predicates_render():
    preds = chunks_to_predicates("id", split_numeric_range(0, 99, 2))
    assert preds[0] == "(id >= 0 AND id < 50) OR id IS NULL"
    assert preds[1] == "id >= 50"
    spreds = chunks_to_predicates("k", [Chunk("a'b", "c")])
    assert spreds[0] == "(k >= 'a''b' AND k < 'c') OR k IS NULL"
