"""Distributed Bloom filter for semi-join reduction.

The classic 100 TB shuffle-killer: a big fact table joins a small,
heavily-filtered dimension, and the join shuffles the ENTIRE fact side
before the join discards 99 % of it. A Bloom filter built from the
dimension keys and pushed into a scan-side predicate prunes those rows
*before* the exchange, so the shuffle carries only plausible matches —
the same idea as Spark's AQE runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but as an
explicit, engine-owned operator that works on any plan shape (the AQE
rewrite only fires on eligible shuffle-join patterns it can prove).

Representation: the filter is an ``m``-bit bitmap embedded in the plan
as ONE ``m/8``-byte BINARY literal. Probing is pure native expression —
``substring`` to pick the byte (byte-indexed and O(1) on BinaryType;
a *string* bitmap would make every probe an O(m) UTF-8 char walk —
measured 73 s vs 0.3 s over 60 k rows), ``hex``+``conv`` to decode it,
bitwise AND against ``1 << (pos & 7)`` — no UDF, no broadcast
variable, no Python on the hot path.

Hashing: Kirsch–Mitzenmacher double hashing (``g_i = h1 + i*h2 mod m``,
Kirsch & Mitzenmacher 2006), with ``h1/h2`` two independent
``xxhash64`` streams — k probe positions from two hash evaluations,
with the standard false-positive guarantees.

Build cost: one scan of the build side, explode to k positions, one
shuffle of at most ``m/64`` bitmap words (bit_or partial-aggregates
map-side), one driver collect of those words — O(m), independent of
build-side row count. Sizing: ``m ≈ 10 bits/key`` gives ~1 % fpp at
``k = 5``; the default ``m = 2^20`` covers ~100 K keys. At larger m
the plan literal grows (2^24 bits = 2 MB binary) — beyond that,
register the bitmap as a 1-row table and cross-join it in (still one
broadcast), or fall back to an exact broadcast semi-join.

False positives never surface: `bloom_prune_join` follows the pruned
scan with the exact join, so the result is value-identical to the
unpruned join (oracle-checked by ext_bloom_prune_join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 5


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions for a key via double hashing. ``h2 | 1`` keeps
    the stride odd so for power-of-two ``m`` it is coprime with m and
    the k probes never collapse onto one position."""
    # Reduce mod m BEFORE the linear combination: raw xxhash64 values
    # sit near ±2^63 and `h1 + i*h2` would overflow under ANSI mode.
    # For power-of-two m, `% m` keeps the low bit, so the stride stays
    # odd (coprime with m) after reduction.
    h1 = F.pmod(F.xxhash64(key), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)).bitwiseOR(F.lit(1)), F.lit(num_bits))
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits)).cast("long")
        for i in range(num_hashes)
    ]


def build_bloom(
    df: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> bytes:
    """Build the filter over ``df[key_col]`` and return the bitmap as
    ``num_bits/8`` bytes (byte i encodes bits 8i..8i+7, LSB first).

    Distributed end to end: explode each key to its k positions, pack
    position → (word = pos >> 6, mask = 1 << (pos & 63)), ``bit_or``
    the masks per word (map-side partial agg, then one exchange of
    ≤ m/64 rows). The only driver materialization is the ≤ m/64
    (word_idx, word) pairs — bounded by the filter size, not the data.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    words = (
        df.where(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    buf = bytearray(num_bits // 8)
    for row in words:
        # word holds bits 64*idx .. 64*idx+63; little-endian bytes so
        # global bit p lands in byte p >> 3 at in-byte position p & 7.
        buf[int(row["word_idx"]) * 8 : int(row["word_idx"]) * 8 + 8] = (
            row["word"] & 0xFFFFFFFFFFFFFFFF
        ).to_bytes(8, "little")
    return bytes(buf)


def bloom_might_contain(
    key: Column,
    bitmap: bytes | Column,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Pure-native membership probe: for each of the k positions, pick
    the byte (O(1) binary substring), decode via ``hex``+``conv``, AND
    against the in-byte bit. NULL keys probe as 'not present'.

    ``bitmap`` may be raw bytes (embedded as a plan literal — fine for
    small filters) or a Column referencing a broadcast 1-row table
    (see :func:`bloom_prune_join` — the literal otherwise repeats per
    expression occurrence and bloats every task binary)."""
    bm = F.lit(bitmap) if isinstance(bitmap, (bytes, bytearray)) else bitmap
    # In-byte masks 1 << (pos & 7) via an 8-element lookup — the
    # classic-API shiftleft only takes a literal bit count.
    bit_masks = F.array(*[F.lit(1 << i) for i in range(8)])
    checks = []
    for p in _positions(key, num_bits, num_hashes):
        byte = F.conv(F.hex(F.substring(bm, (F.shiftright(p, 3) + 1).cast("int"), F.lit(1))), 16, 10).cast("int")
        mask = F.element_at(bit_masks, (p.bitwiseAND(F.lit(7)) + 1).cast("int"))
        checks.append(byte.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return F.coalesce(out, F.lit(False))


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    how: str = "inner",
) -> DataFrame:
    """Semi-join reduction: prune ``fact`` with a Bloom filter of
    ``dim``'s keys BEFORE the join shuffle, then run the exact join so
    false positives are eliminated — value-identical to the plain
    join, but the exchange only carries surviving fact rows.

    Only inner/semi shapes are eligible (an outer fact side must keep
    non-matching rows); raises otherwise rather than silently
    corrupting results.
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(f"bloom pruning would drop outer rows for join type {how!r}")
    bitmap = build_bloom(dim, dim_key, num_bits, num_hashes)
    # Ship the bitmap ONCE via a broadcast 1-row table instead of a
    # plan literal: k probe expressions would each embed their own
    # copy, multiplying it into every stage's task binary.
    from ..io import local_rows

    bmdf = local_rows(dim.sparkSession, [(bitmap,)], "__bloom_bm binary")
    pruned = (
        fact.join(F.broadcast(bmdf), F.lit(True), "inner")
        .where(
            bloom_might_contain(
                F.col(fact_key), F.col("__bloom_bm"), num_bits, num_hashes
            )
        )
        .drop("__bloom_bm")
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)


def merge_blooms(*bitmaps: bytes) -> bytes:
    """Union filters built with identical (m, k): bitwise OR of the
    bitmaps. ``might_contain(merge(a, b)) == might_contain(a) OR
    might_contain(b)`` for build keys — Bloom filters are mergeable
    state, so per-partition / per-day filters can be maintained
    incrementally and OR-ed at query time instead of rebuilding over
    the full history (same pattern as the HLL registers in
    operators/incremental.py)."""
    if not bitmaps:
        raise ValueError("need at least one bitmap")
    sizes = {len(b) for b in bitmaps}
    if len(sizes) != 1:
        raise ValueError(f"bitmap sizes differ: {sorted(sizes)}")
    out = bytearray(bitmaps[0])
    for bm in bitmaps[1:]:
        for i, byte in enumerate(bm):
            out[i] |= byte
    return bytes(out)
