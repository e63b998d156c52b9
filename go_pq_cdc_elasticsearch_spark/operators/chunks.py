"""Chunk arithmetic parity helpers.

The reference splits oversized handler outputs into fixed-size chunks
(``internal/slices/slices.go:3-16``, used at ``connector.go:162-171``) and
splits a flushed batch into N near-equal chunks for concurrent bulk requests
(``internal/slices/slices.go:18-39``). Spark gets both behaviors from
partitioning, but the arithmetic is part of the reference's contract and is
kept as pure functions (unit-tested, and exposed as Q-C7).
"""

from __future__ import annotations


def chunk_count(n: int, chunk_size: int) -> int:
    """Number of chunks ChunkWithSize produces for n items
    (reference internal/slices/slices.go:3-16): ceil(n / chunk_size),
    i.e. ((n - 1) // chunk_size) + 1 for n > 0."""
    # validate unconditionally: behind the n<=0 early-return, a bad
    # chunk_size wired at deploy time surfaced only on first non-empty
    # data (review r7)
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if n <= 0:
        return 0
    return (n - 1) // chunk_size + 1


def balanced_chunk_sizes(n: int, chunks: int) -> list[int]:
    """Near-equal chunk sizes for concurrent fan-out
    (reference internal/slices/slices.go:18-39): first n % chunks chunks get
    one extra element."""
    if chunks <= 0:
        raise ValueError("chunks must be positive")
    if n <= 0:
        return []
    chunks = min(chunks, n)
    base, extra = divmod(n, chunks)
    return [base + (1 if i < extra else 0) for i in range(chunks)]
