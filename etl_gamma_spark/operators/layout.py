"""Z-order (Morton-curve) layout analysis — the dual-dialect twin of the
write path in ``sources/sink.py`` (``zorder_value`` / ``write_zordered``).

Why two forms: the WRITE path needs a pyspark ``Column`` (sink.py builds
it with F.shiftleft/bitwiseOR and range-partitions the output files); the
ANALYSIS path — "is this layout actually tiled?", graded by the driver's
DuckDB oracle — needs the SAME arithmetic as a SQL string in BOTH
dialects. ``zvalue_expr`` here generates that string with the identical
bit convention (first column on ODD z-bits, second on EVEN, matching
``sink.zorder_value``); tests/test_round6_ops.py pins the two forms
bit-for-bit against each other and against a pure-Python interleave.

This module also adds the min-max quantization step sink.py's docstring
delegates to callers: real keys rarely span [0, 2^bits), and
interleaving raw truncated values scrambles locality, so ``Z_BITS``-bit
min-max ranks are computed first (integer mul + integer div — engine-
portable), attached via a 1-row broadcast (``bcast_attach`` — no
collect, no BroadcastNestedLoopJoin).

The payoff at 100 TB: a bucket = a z-range = an axis-aligned tile, so
parquet footer min/max stats prune scans filtered on EITHER column —
the Delta/Iceberg ``ZORDER BY`` effect from plain Spark primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from .similarity import bcast_attach

S = T.SPARK

Z_BITS = 16  # per-dimension bits; z fits in 32 bits → BIGINT-safe


def zvalue_expr(x: str, y: str, bits: int = Z_BITS, d: str = S) -> str:
    """Morton interleave of two non-negative ints (< 2^bits each): bit j
    of ``x`` lands at z-bit 2j+1, bit j of ``y`` at 2j — the same
    convention as ``sink.zorder_value(c1, c2)`` (pinned by test). A flat
    left-associative sum of 2·bits masked shifts — no loop, no UDF."""
    terms = []
    for j in range(bits):
        terms.append(f"({T.bit(x, j, d)} * {1 << (2 * j + 1)})")
        terms.append(f"({T.bit(y, j, d)} * {1 << (2 * j)})")
    return "(" + " + ".join(terms) + ")"


def quantize_expr(
    col: str, mn: str, mx: str, bits: int = Z_BITS, d: str = S
) -> str:
    """Min-max quantization of ``col`` onto [0, 2^bits-1] — integer
    arithmetic only (mul then integer-div), identical in both engines; a
    constant column (mx = mn) quantizes to 0 via the nullif/coalesce."""
    top = (1 << bits) - 1
    q = T.idiv(f"(({col} - {mn}) * {top})", f"nullif({mx} - {mn}, 0)", d)
    return f"coalesce({q}, 0)"


def zorder_buckets(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = Z_BITS,
    n_buckets: int = 64,
) -> DataFrame:
    """Attach quantized coords (``xq``, ``yq``), the z-value (``zval``)
    and its range bucket (``zbucket`` = z DIV (2^(2·bits) / n)). With
    n_buckets = 4^k, each bucket fixes the top k bits of BOTH quantized
    dimensions — every bucket is an axis-aligned tile of side
    2^(bits-k), the bounded-extent property file skipping relies on."""
    stats = df.agg(
        F.min(x_col).alias("__xmn"),
        F.max(x_col).alias("__xmx"),
        F.min(y_col).alias("__ymn"),
        F.max(y_col).alias("__ymx"),
    )
    step = (1 << (2 * bits)) // n_buckets
    return (
        bcast_attach(df, stats, x_col, "__xmn")
        .selectExpr(
            "*",
            f"{quantize_expr(x_col, '__xmn', '__xmx', bits)} AS xq",
            f"{quantize_expr(y_col, '__ymn', '__ymx', bits)} AS yq",
        )
        .selectExpr("*", f"{zvalue_expr('xq', 'yq', bits)} AS zval")
        .selectExpr("*", f"(zval DIV {step}) AS zbucket")
        .drop("__xmn", "__xmx", "__ymn", "__ymx")
    )


def write_zordered_quantized(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = Z_BITS,
    n_files: int = 64,
) -> None:
    """Quantize-then-write convenience: min-max rank the two columns and
    hand the interleave to ``sink.write_zordered``'s layout (range
    partition + in-file sort). Use this when the raw columns don't
    already fit [0, 2^bits) — sink's writer requires pre-quantized
    inputs."""
    z = zorder_buckets(df, x_col, y_col, bits, n_buckets=n_files)
    (
        z.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .drop("xq", "yq", "zval", "zbucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .parquet(path)
    )
