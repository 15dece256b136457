"""Integer-exact quantized natural logarithm for SQL shared by both
engines (Spark + the DuckDB oracle).

ln(num/den) is approximated WITHOUT any floating-point log:
x = num*4096 DIV den is a 12-bit fixed-point of the ratio; the
exponent is its bit length (length(bin(x)) — both engines print
binary without leading zeros), and a 4-bit mantissa nibble indexes a
PINNED table of ln(1 + k/16) in milli-nats. Both the fixed point
and the nibble TRUNCATE (floor), so the approximation is one-sided:
at most ln(17/16) ~ 0.061 nats below the true log —
deterministic, associative, and bit-identical across engines, which
an IEEE log never is across libm implementations.

Used by the retrieval/scoring family (BM25 idf, unigram surprisal,
weight-of-evidence) — the places a data engine traditionally gives
up exactness; quantization keeps the differential oracle exact.
"""

from __future__ import annotations

# ln(1 + k/16) * 1000, k = 0..15 (pinned milli-nat mantissa table)
LN_MANTISSA_E3 = (
    0, 61, 118, 172, 223, 271, 318, 362,
    405, 446, 486, 524, 560, 595, 629, 662,
)

LN2_E3 = 693  # ln(2) * 1000


def ln_ratio_e3_sql(num: str, den: str) -> str:
    """SQL (engine-neutral, caller replaces DIV with div or //) for
    ln(num/den) in milli-nats, requiring num >= den > 0 (callers
    handle sign by swapping and negating). The mantissa CASE is
    generated from the pinned table."""
    x = f"(({num}) * 4096 DIV ({den}))"
    bl = f"length(bin({x}))"
    nib = f"(({x}) >> ({bl} - 5)) & 15"
    case = " ".join(
        f"WHEN {k} THEN {v}" for k, v in enumerate(LN_MANTISSA_E3)
    )
    return f"({LN2_E3} * ({bl} - 13) + (CASE {nib} {case} END))"


def ln_ratio_e3_py(num: int, den: int) -> int:
    """Python replay of ln_ratio_e3_sql (tests pin equivalence)."""
    x = num * 4096 // den
    bl = x.bit_length()
    nib = (x >> (bl - 5)) & 15
    return LN2_E3 * (bl - 13) + LN_MANTISSA_E3[nib]
