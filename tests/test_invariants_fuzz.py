"""Property-based invariants for chunk planning and the type lattice.

Chunk plans feed ``spark.read.jdbc(predicates=...)`` — a gap double-reads
nothing but LOSES rows, an overlap double-applies them, so total coverage
of the keyspace is the correctness contract. The lattice invariants are
what makes schema merging order-independent: discovery samples arrive in
nondeterministic order at scale, and only a commutative/associative/
monotone fold gives every executor the same resolved schema.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from olake_spark.plans.chunks import (
    Chunk,
    split_numeric_range,
    split_string_keyspace,
    walk_boundaries,
)
from olake_spark.typesys.lattice import DataType, common_ancestor, fold_types

# ---------------------------------------------------------------------------
# numeric chunk plans
# ---------------------------------------------------------------------------


def _assert_covers(chunks: list[Chunk], lo: int, hi: int) -> None:
    assert chunks[0].min == lo
    assert chunks[-1].max is None  # unbounded tail absorbs late inserts
    for prev, nxt in zip(chunks, chunks[1:]):
        assert prev.max == nxt.min  # half-open ranges: no gap, no overlap
        assert prev.min < prev.max


@settings(max_examples=100, deadline=None)
@given(
    lo=st.integers(-(2**62), 2**62),
    span=st.integers(0, 10**12),
    n=st.integers(1, 500),
)
def test_numeric_split_covers_keyspace(lo, span, n):
    hi = lo + span
    chunks = split_numeric_range(lo, hi, n)
    assert 1 <= len(chunks) <= n
    _assert_covers(chunks, lo, hi)


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(st.integers(0, 10**9), min_size=1, max_size=400, unique=True),
    step=st.integers(1, 50),
)
def test_boundary_walk_covers_real_keys(keys, step):
    keys = sorted(keys)

    def next_boundary(cur):
        after = [k for k in keys if k > cur]
        return after[step - 1] if len(after) >= step else None

    chunks = walk_boundaries(keys[0], next_boundary)
    _assert_covers(chunks, keys[0], keys[-1])
    # every key lands in exactly one half-open chunk
    for k in keys:
        owners = [
            c for c in chunks if c.min <= k and (c.max is None or k < c.max)
        ]
        assert len(owners) == 1


_key = st.text(
    alphabet=st.characters(min_codepoint=48, max_codepoint=122), min_size=1, max_size=8
)


@settings(max_examples=100, deadline=None)
@given(a=_key, b=_key, n=st.integers(2, 40))
def test_string_keyspace_split_is_ordered_cover(a, b, n):
    lo, hi = min(a, b), max(a, b)
    chunks = split_string_keyspace(lo, hi, n)
    assert chunks[0].min == lo and chunks[-1].max is None
    for prev, nxt in zip(chunks, chunks[1:]):
        assert prev.max == nxt.min
        assert prev.min < prev.max  # strictly increasing boundaries


# ---------------------------------------------------------------------------
# type lattice
# ---------------------------------------------------------------------------

_types = st.sampled_from(list(DataType))


@settings(max_examples=200, deadline=None)
@given(a=_types, b=_types)
def test_lca_commutative(a, b):
    assert common_ancestor(a, b) == common_ancestor(b, a)


@settings(max_examples=200, deadline=None)
@given(a=_types, b=_types, c=_types)
def test_lca_associative(a, b, c):
    lhs = common_ancestor(common_ancestor(a, b), c)
    rhs = common_ancestor(a, common_ancestor(b, c))
    assert lhs == rhs


@settings(max_examples=100, deadline=None)
@given(a=_types)
def test_lca_idempotent_and_null_identity(a):
    assert common_ancestor(a, a) == a
    assert common_ancestor(a, DataType.NULL) == a


@settings(max_examples=100, deadline=None)
@given(ts=st.lists(_types, min_size=1, max_size=6))
def test_fold_is_order_independent(ts):
    import itertools

    base = fold_types(ts)
    for perm in itertools.islice(itertools.permutations(ts), 24):
        assert fold_types(list(perm)) == base
    # folding in the result is a no-op (monotone upper bound)
    assert fold_types(ts + [base]) == base


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=0,
        max_size=60,
    ),
    st.integers(41, 60),
)
def test_connected_components_matches_union_find(spark, edges, n_nodes):
    """Spark min-label propagation == a reference union-find on random
    graphs: same partition of nodes, labels = min member id."""
    from olake_spark.operators.dedup import connected_components

    # reference: union-find with min-id labels
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n_nodes)}

    ids = spark.createDataFrame([(i,) for i in range(n_nodes)], ["doc_id"])
    pair_rows = [(a, b) for a, b in edges if a != b]
    if pair_rows:
        pairs = spark.createDataFrame(pair_rows, ["id_a", "id_b"])
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    # BOTH execution paths must match the reference: the driver-side DSU
    # (default for small edge sets) and the distributed min-label loop
    # (forced via driver_collect_max=0)
    got_dsu = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(ids, pairs).collect()
    }
    assert got_dsu == expected
    got_loop = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(ids, pairs, driver_collect_max=0).collect()
    }
    assert got_loop == expected
