"""Engine-portable Bloom-filter semi-join pruning.

The 100 TB problem this solves: a fact-table scan must be reduced to the
rows whose key appears in a (much smaller, but not broadcast-tiny)
filtered dimension selection. A plain semi-join shuffles the ENTIRE fact
table on the key; Spark's own runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) exists for exactly
this, but its ``BloomFilterAggregate`` bit layout is implementation-
internal — useless when the filter must be shared across engines or
persisted next to the data. This module builds the same optimization
from portable primitives:

* ``k`` hash positions per key come from DISJOINT 8-hex windows of ONE
  md5 digest (round-5 lesson: slice one digest, never hash k seeded
  strings) modulo ``m`` slots.
* The "filter" is the DISTINCT position set of the build keys — at most
  ``min(m, k·|build|)`` small integers (m=65536 → a <0.5 MB broadcast),
  reduced map-side by the distinct aggregate, so only deduplicated
  positions ever cross the wire. It is just a table: write it once,
  reuse it across jobs/engines.
* A probe row SURVIVES the prefilter iff all ``k`` of its positions are
  present — classic Bloom semantics (no false negatives, false-positive
  rate ≈ (1 - e^{-k·n/m})^k) expressed as ``k`` successive BROADCAST
  left-semi joins on the position value: map-side row pruning, no
  explode fan-out, no bit arithmetic, nothing engine-specific.
* An exact semi-join runs on the survivors, so the OUTPUT is identical
  to the plain semi-join — which is what the oracle checks; the Bloom
  stage is a pure plan optimization, and its superset/false-positive
  contract is unit-tested separately (tests/test_round6_ops.py).

At cluster scale the win: only candidate rows (true matches + ~fp%) pay
the key exchange of the verify join — the same effect as Spark's runtime
bloom filter, but deterministic, portable, and persistable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

S = T.SPARK

BLOOM_M = 65536  # slots; md5 gives 4 disjoint 8-hex (32-bit) windows
BLOOM_K = 4


def _digest_expr(key: str, d: str = S) -> str:
    return f"md5(CAST({key} AS STRING))" if d == S else f"md5(CAST({key} AS VARCHAR))"


def _window_expr(dig: str, j: int, m: int, d: str = S) -> str:
    """Slot position j from the j-th disjoint 8-hex window of a BOUND
    digest column (md5 is 32 hex chars = exactly 4 windows). The digest
    must be materialized in its own projection first — Spark does not CSE
    a repeated md5() across sibling expressions (CLAUDE.md lesson)."""
    sub = f"substr({dig}, {1 + 8 * j}, 8)"
    if d == S:
        return f"(CAST(conv({sub}, 16, 10) AS BIGINT) % {m})"
    return f"(CAST(('0x' || {sub}) AS BIGINT) % {m})"


def bloom_positions(
    build: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """The portable Bloom filter as data: the distinct slot-position set
    of the build keys — one ``pos`` int column, ≤ min(m, k·n) rows."""
    if k > 4:
        raise ValueError("k > 4 needs a second digest; md5 has 4 windows")
    wins = ", ".join(
        _window_expr("__dig", j, m) for j in range(k)
    )
    return (
        build.selectExpr(f"{_digest_expr(key_col)} AS __dig")
        .selectExpr(f"explode(array({wins})) AS pos")
        .distinct()
    )


def bloom_prune(
    probe: DataFrame,
    positions: DataFrame,
    probe_key: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Probe rows passing the Bloom membership test (superset of the true
    semi-join; false positives possible, false negatives impossible).
    ``positions`` is a ``bloom_positions`` output (or the same table read
    back from storage). Implemented as k broadcast left-semi joins — each
    prunes rows map-side before any shuffle. Output columns = probe's."""
    dig = probe.selectExpr(
        "*", f"{_digest_expr(probe_key)} AS __dig"
    ).selectExpr(
        "*", *[f"{_window_expr('__dig', j, m)} AS __pos{j}" for j in range(k)]
    )
    out = dig
    for j in range(k):
        out = out.join(
            F.broadcast(positions.withColumnRenamed("pos", f"__pos{j}")),
            f"__pos{j}",
            "left_semi",
        )
    return out.drop("__dig", *[f"__pos{j}" for j in range(k)])


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    exact: bool = True,
) -> DataFrame:
    """Rows of ``probe`` whose ``probe_key`` appears in ``build``'s
    ``build_key`` set — a semi-join whose probe side is pre-pruned by the
    portable Bloom position filter before the key shuffle.

    ``exact=False`` stops after the Bloom stage (candidate superset —
    the cheap pre-filter a caller may chain into its own verify); the
    default runs the exact left-semi verify so the result is identical to
    ``probe.join(build, key, "left_semi")``.
    """
    pruned = bloom_prune(probe, bloom_positions(build, build_key, m, k), probe_key, m, k)
    if not exact:
        return pruned
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return pruned.join(keys, probe_key, "left_semi")
