"""Core layout constants for the TPU-native bitmap engine.

The reference (FeatureBase) fixes ShardWidth = 2^20 columns per shard
(reference: shardwidth/helper.go:15, fragment.go:37) and roaring containers of
2^16 bits (reference: roaring/roaring.go:53).  We keep the same *logical*
address space — `pos = row * SHARD_WIDTH + (col % SHARD_WIDTH)` (reference:
fragment.go:1306) — but the physical layout is a dense bitmap tile in HBM:
each row of a fragment is SHARD_WIDTH bits stored as 32768 uint32 words
(little-endian bit order within a word), which maps exactly onto the TPU VPU's
32-bit lanes as a (256, 128) tile.
"""

# Number of columns per shard: 2^20 (reference shardwidth/helper.go:15).
SHARD_WIDTH_EXP = 20
SHARD_WIDTH = 1 << SHARD_WIDTH_EXP

# Word layout: 32-bit words, native VPU lane width.
WORD_BITS = 32
WORD_SHIFT = 5
WORD_MASK = WORD_BITS - 1

# uint32 words per shard-row of bitmap.
WORDS_PER_ROW = SHARD_WIDTH // WORD_BITS  # 32768 = 256 * 128

# Roaring container granularity — only relevant at the (de)serialization
# boundary for compatibility with reference import/export payloads
# (reference: roaring/roaring.go:53; fragment.go:45 shardVsContainerExponent).
CONTAINER_BITS = 1 << 16
CONTAINERS_PER_ROW = SHARD_WIDTH // CONTAINER_BITS  # 16

# BSI row layout within a bsig_ view (reference: fragment.go:62-65):
# row 0 = exists bit, row 1 = sign bit, rows 2..2+depth = magnitude bit slices.
BSI_EXISTS_ROW = 0
BSI_SIGN_ROW = 1
BSI_OFFSET = 2

# Number of key-translation / shard partitions (reference: disco/snapshot.go:24
# defaultPartitionN = 256).
PARTITION_N = 256


def pos(row: int, col: int) -> int:
    """Fragment bit position for (row, column-within-shard)."""
    return (row << SHARD_WIDTH_EXP) + (col % SHARD_WIDTH)


def shard_of(col: int) -> int:
    return col >> SHARD_WIDTH_EXP
