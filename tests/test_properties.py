"""Property-based tests (hypothesis) for the engine's algebraic core.

The whole distributed design rests on the summary being a commutative-
enough monoid: any partitioning of the document stream, folded per
partition and merged in pid order, must yield the same schema as a
sequential fold (SURVEY §3.1). These properties are what the pytest
examples sample; hypothesis searches the space.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from polars_genson_spark.functions import summary as S
from polars_genson_spark.functions.dtypes import format_dtype, parse_dtype
from polars_genson_spark.functions.normalise import normalise_document
from polars_genson_spark.functions.avro import json_schema_to_avro
from polars_genson_spark.config import NormaliseConfig

# --- JSON document strategy (bounded depth/width) --------------------------

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=8),
)
field_names = st.sampled_from(["a", "b", "c", "d", "count", "items"])
json_values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(field_names, children, max_size=4),
    ),
    max_leaves=12,
)
documents = st.dictionaries(field_names, json_values, min_size=0, max_size=5)


def fold(docs):
    node = S.new_summary()
    for d in docs:
        S.observe(node, d)
    return node


@settings(max_examples=120, deadline=None)
@given(st.lists(documents, min_size=1, max_size=12), st.data())
def test_partition_invariance(docs, data):
    """Any split of the doc stream into contiguous partitions, folded and
    merged in order, equals the sequential fold."""
    n = len(docs)
    cut_points = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=n), max_size=3, unique=True
            )
        )
    )
    cuts = [0, *cut_points, n]
    merged = S.new_summary()
    for lo, hi in zip(cuts, cuts[1:]):
        S.merge(merged, fold(docs[lo:hi]))
    assert S.to_schema(merged) == S.to_schema(fold(docs))


@settings(max_examples=80, deadline=None)
@given(
    st.lists(documents, min_size=1, max_size=6),
    st.lists(documents, min_size=1, max_size=6),
    st.lists(documents, min_size=1, max_size=6),
)
def test_merge_associative(d1, d2, d3):
    a, b, c = fold(d1), fold(d2), fold(d3)
    left = S.merge(S.merge(fold(d1), fold(d2)), fold(d3))
    right = S.merge(fold(d1), S.merge(fold(d2), fold(d3)))
    assert S.to_schema(left) == S.to_schema(right)


@settings(max_examples=60, deadline=None)
@given(st.lists(documents, min_size=1, max_size=8))
def test_merge_identity_and_key(docs):
    node = fold(docs)
    with_identity = S.merge(S.new_summary(), fold(docs))
    assert S.to_schema(with_identity) == S.to_schema(node)
    # summary_key is count-insensitive: observing the stream twice gives
    # the same key (counts double, structure doesn't)
    assert S.summary_key(fold(docs + docs)) == S.summary_key(node)


@settings(max_examples=60, deadline=None)
@given(st.lists(documents, min_size=1, max_size=8))
def test_dedup_fold_equivalence(docs):
    """A6: merging a duplicate summary is a no-op for the schema."""
    node = fold(docs)
    twice = S.merge(fold(docs), fold(docs))
    assert S.to_schema(twice) == S.to_schema(node)


@settings(max_examples=60, deadline=None)
@given(st.lists(documents, min_size=1, max_size=6))
def test_normalise_idempotent(docs):
    """normalise(normalise(doc)) == normalise(doc) against the corpus's
    own inferred Avro schema — schema enforcement is a projection."""
    schema = json_schema_to_avro(S.to_schema(fold(docs)))
    cfg = NormaliseConfig()
    for doc in docs:
        once = normalise_document(doc, schema, cfg)
        if once is None:
            continue
        twice = normalise_document(once, schema, cfg)
        assert twice == once


dtype_strings = st.recursive(
    st.sampled_from(
        [
            "String", "Int64", "Int32", "Float64", "Boolean", "Date",
            "Datetime", "Duration", "Binary", "Null", "Decimal(10,2)",
        ]
    ),
    lambda children: st.one_of(
        children.map(lambda s: f"List[{s}]"),
        st.lists(
            st.tuples(st.sampled_from(["f1", "f2", "g"]), children),
            min_size=1, max_size=3, unique_by=lambda t: t[0],
        ).map(
            lambda fs: "Struct["
            + ",".join(f"{n}:{t}" for n, t in fs)
            + "]"
        ),
    ),
    max_leaves=6,
)


@settings(max_examples=120, deadline=None)
@given(dtype_strings)
def test_dtype_string_round_trip_stable(s):
    """parse → format reaches a fixed point in one step (idempotent on
    its own output), and re-parsing yields the same Spark type."""
    dt = parse_dtype(s)
    s2 = format_dtype(dt)
    assert parse_dtype(s2) == dt
    assert format_dtype(parse_dtype(s2)) == s2


@settings(max_examples=300, deadline=None)
@given(
    st.floats(-1e6, 1e6),
    st.floats(-1e6, 1e6),
    st.floats(-1e3, 1e3),
    st.floats(0.001, 1e3),
    st.floats(0.001, 2e3),
)
def test_range_join_bucket_coverage(l, r, lower, span, w):
    """The binned range join's no-false-negative invariant: every right
    value inside [l+lower, l+upper) falls in a bucket the left row was
    exploded to — over arbitrary float inputs, including windows not
    aligned to bucket edges (mirrors relational.range_join's math)."""
    import math

    upper = lower + span
    if not (l + lower <= r < l + upper):
        return
    lb = math.floor((l + lower) / w)
    ub = math.floor((l + upper) / w)
    rb = math.floor(r / w)
    assert lb <= rb <= ub


# --- BPE tokenizer core (pure driver-side algebra) -------------------------

words_strategy = st.lists(
    st.text(
        # ascii letters plus multibyte (CJK, accented, emoji) — merges
        # operate on unicode code points, not bytes, so segmentation
        # must reconstruct regardless of encoding width
        alphabet=st.sampled_from(list("abcdefghé世界😀")),
        min_size=1, max_size=8,
    ),
    min_size=1, max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(words=words_strategy, n_merges=st.integers(min_value=0, max_value=20))
def test_bpe_segmentation_reconstructs_word(words, n_merges):
    """Lossless-ness: the concatenation of a word's BPE tokens is always
    the word plus the end marker, for ANY trained merge table and ANY
    word (seen or unseen)."""
    from polars_genson_spark.operators.tokenizer import (
        END,
        _segment,
        _train_from_rows,
    )

    rows = [{"word": w, "count": i + 1} for i, w in enumerate(words)]
    merges = _train_from_rows(rows, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in words + ["zzznever", "a"]:
        assert "".join(_segment(w, ranks)) == w + END


@settings(max_examples=60, deadline=None)
@given(words=words_strategy)
def test_bpe_training_deterministic_and_bounded(words):
    from polars_genson_spark.operators.tokenizer import _train_from_rows

    rows = [{"word": w, "count": 2} for w in words]
    m1 = _train_from_rows(rows, 15)
    m2 = _train_from_rows(rows, 15)
    assert m1 == m2
    # merge count can stop early (no pair with count >= 2) but never
    # exceeds the request
    assert len(m1) <= 15
