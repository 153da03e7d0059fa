"""Ground-truth tests for training-sequence packing + source mixing."""

from __future__ import annotations

from kissmetrics_to_database_spark.operators import packing


def test_pack_sequences_offsets_and_spill(spark):
    # Bucket 0, budget 5: docs (1: 3 tok), (2: 4 tok), (3: 2 tok).
    # Concatenated stream offsets: d1@0, d2@3, d3@7.
    rows = [(1, 0, 3), (2, 0, 4), (3, 0, 2), (9, 1, 11)]
    df = spark.createDataFrame(rows, ["doc_id", "bucket", "n_tokens"])
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in packing.pack_sequences(df, budget=5).collect()
    }
    assert out == {1: (0, 0), 2: (0, 3), 3: (1, 2), 9: (0, 0)}


def test_pack_sequences_bucket_isolation(spark):
    # Same doc ids in different buckets pack independently.
    rows = [(1, b, 4) for b in range(3)] + [(2, b, 4) for b in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "bucket", "n_tokens"])
    out = packing.pack_sequences(df, budget=4).collect()
    assert all(
        (r["doc_id"], r["seq_id"], r["seq_offset"]) in {(1, 0, 0), (2, 1, 0)}
        for r in out
    )


def test_sequence_stats_rollup(spark):
    rows = [(1, 0, 3), (2, 0, 4), (3, 0, 2)]
    df = spark.createDataFrame(rows, ["doc_id", "bucket", "n_tokens"])
    packed = packing.pack_sequences(df, budget=5)
    stats = {
        (r["bucket"], r["seq_id"]): (r["n_docs"], r["seq_tokens"])
        for r in packing.sequence_stats(packed).collect()
    }
    assert stats == {(0, 0): (2, 7), (0, 1): (1, 2)}


def test_source_temperature_weights(spark):
    # tokens: a=16, b=1; alpha=0.5 → w=4,1 → weights 0.8, 0.2.
    rows = [(1, "a", 10), (2, "a", 6), (3, "b", 1)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    out = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["weight"])
        for r in packing.source_temperature_weights(df, alpha=0.5).collect()
    }
    assert out == {"a": (2, 16, 0.8), "b": (1, 1, 0.2)}


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # bucket
            st.integers(min_value=0, max_value=40),   # n_tokens
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=16),           # budget
)
@settings(max_examples=5, deadline=None)
def test_pack_sequences_invariants(spark, rows, budget):
    data = [(i, b, t) for i, (b, t) in enumerate(rows)]
    df = spark.createDataFrame(data, ["doc_id", "bucket", "n_tokens"])
    packed = packing.pack_sequences(df, budget=budget).collect()

    # Every doc keeps its row; offsets stay inside the budget.
    assert len(packed) == len(data)
    assert all(0 <= r["seq_offset"] < budget for r in packed)

    # Matches a sequential per-bucket simulation exactly.
    expect = {}
    cum: dict[int, int] = {}
    for i, (b, t) in enumerate(rows):
        c = cum.get(b, 0)
        expect[i] = (c // budget, c % budget)
        cum[b] = c + t
    got = {r["doc_id"]: (r["seq_id"], r["seq_offset"]) for r in packed}
    assert got == expect

    # Token conservation through the per-sequence rollup.
    stats = packing.sequence_stats(
        packing.pack_sequences(df, budget=budget)
    ).collect()
    assert sum(r["seq_tokens"] for r in stats) == sum(t for _, t in rows)


def test_chunk_documents_ground_truth(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 3)], ["doc_id", "n_tokens"]
    )
    out = packing.chunk_documents(df, chunk_size=4, stride=3).collect()
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["start_tok"], r["chunk_len"]) for r in out
    )
    assert got == [
        (1, 0, 0, 4),
        (1, 1, 3, 4),
        (1, 2, 6, 4),
        (1, 3, 9, 1),
        (3, 0, 0, 3),
    ]
    # Zero-token doc emits nothing; every token of doc 1 is covered.
    assert all(r["doc_id"] != 2 for r in out)
