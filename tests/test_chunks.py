"""Chunk arithmetic parity (reference internal/slices/slices.go)."""

from hypothesis import given
from hypothesis import strategies as st

from go_pq_cdc_elasticsearch_spark.operators.chunks import (
    balanced_chunk_sizes,
    chunk_count,
)


def test_chunk_count_reference_cases():
    # ChunkWithSize semantics: ceil(n / size)
    assert chunk_count(0, 8000) == 0
    assert chunk_count(1, 8000) == 1
    assert chunk_count(8000, 8000) == 1
    assert chunk_count(8001, 8000) == 2
    assert chunk_count(16000, 8000) == 2
    assert chunk_count(5, 2) == 3


@given(st.integers(0, 10**7), st.integers(1, 10**5))
def test_chunk_count_is_ceil(n, size):
    assert chunk_count(n, size) == -(-n // size) if n > 0 else chunk_count(n, size) == 0


def test_balanced_chunks_reference_cases():
    # Chunk(slice, chunks) near-equal split: first n%chunks get one extra
    assert balanced_chunk_sizes(10, 3) == [4, 3, 3]
    assert balanced_chunk_sizes(9, 3) == [3, 3, 3]
    assert balanced_chunk_sizes(2, 5) == [1, 1]
    assert balanced_chunk_sizes(0, 4) == []


@given(st.integers(0, 10**6), st.integers(1, 64))
def test_balanced_chunks_properties(n, chunks):
    sizes = balanced_chunk_sizes(n, chunks)
    assert sum(sizes) == n
    if n > 0:
        assert max(sizes) - min(sizes) <= 1
        assert len(sizes) == min(chunks, n)
