"""Seeded-random fuzz for the round-5 batch-2 operators, each checked
against an independent pure-Python model (same strategy as
test_quality_ops.test_gopher_and_pack_on_seeded_random_corpus): the
DuckDB oracles share expression text with the engine where dialects
allow, so these Python recomputations are the genuinely independent
check."""

import random

from pyspark.sql import functions as F  # noqa: F401  (parity with sibling tests)

SEED = 20260814


def _chunks(text: str, w: int = 10) -> list[str]:
    words = text.split(" ")
    n = max(len(words), 1)
    return [" ".join(words[i * w : (i + 1) * w]) for i in range((n - 1) // w + 1)]


def test_chunk_dedup_fuzz_vs_python_model(spark):
    from etl_gamma_spark.operators.dedup import chunk_dedup

    rng = random.Random(SEED)
    # paragraph pool: heavy reuse so cross-document chunk collisions are common
    pool = [
        " ".join(f"p{p}w{i}" for i in range(10)) for p in range(12)
    ]
    rows = []
    for did in range(300):
        n_par = rng.randint(1, 6)
        parts = [
            rng.choice(pool)
            if rng.random() < 0.6
            else " ".join(f"u{did}x{i}" for i in range(rng.randint(1, 14)))
            for _ in range(n_par)
        ]
        rows.append((did, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # python model: global keep-first by (doc_id, pos)
    seen: set[str] = set()
    expect = {}
    for did, text in sorted(rows):
        cs = _chunks(text)
        kept = []
        for c in cs:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        expect[did] = (len(cs), len(kept), " ".join(kept))

    got = {r.doc_id: (r.n_chunks, r.n_kept, r.text_clean) for r in chunk_dedup(df).collect()}
    assert got == expect


def test_apply_changes_fuzz_vs_python_model(spark):
    from etl_gamma_spark.operators.cdc import apply_changes

    rng = random.Random(SEED)
    base_rows = [(k, rng.randint(0, 999)) for k in range(200)]
    change_keys = rng.sample(range(260), 120)  # keys 200+ exercise inserts
    change_rows = [
        (k, rng.randint(0, 999), rng.choice(["U", "U", "D"])) for k in change_keys
    ]
    base = spark.createDataFrame(base_rows, "key long, v long")
    changes = spark.createDataFrame(change_rows, "key long, v long, op string")

    expect = dict(base_rows)
    for k, v, op in change_rows:
        if op == "D":
            expect.pop(k, None)
        else:
            expect[k] = v

    got = {r.key: r.v for r in apply_changes(base, changes, "key", ["v"]).collect()}
    assert got == expect


def test_funnel_and_retention_fuzz_vs_python_model(spark):
    import datetime as dt

    from etl_gamma_spark.operators.temporal import funnel_steps, retention_cohorts

    rng = random.Random(SEED)
    types = ["view", "click", "purchase", "error"]
    rows = []
    for _ in range(1500):
        rows.append(
            (
                rng.randint(1, 60),
                dt.datetime(2024, 1, rng.randint(1, 20), rng.randint(0, 23),
                            rng.randint(0, 59), rng.randint(0, 59)),
                rng.choice(types),
            )
        )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    # funnel model
    steps = ["view", "click", "purchase"]
    reached = {u for u, _, _ in rows}
    prev_t: dict[int, dt.datetime] = {}
    expected_counts = []
    for i, step in enumerate(steps):
        cur: dict[int, dt.datetime] = {}
        for u, ts, et in rows:
            if et != step or u not in reached:
                continue
            if i > 0 and not ts > prev_t[u]:
                continue
            if u not in cur or ts < cur[u]:
                cur[u] = ts
        expected_counts.append(len(cur))
        reached = set(cur)
        prev_t = cur
    got = {r.step_idx: r.n_users for r in funnel_steps(df, steps).collect()}
    assert [got[i + 1] for i in range(3)] == expected_counts

    # retention model
    first = {}
    per_user_days = {}
    for u, ts, _ in rows:
        d = ts.date()
        first[u] = min(first.get(u, d), d)
        per_user_days.setdefault(u, set()).add(d)
    expect: dict[tuple, int] = {}
    for u, days in per_user_days.items():
        for d in days:
            key = (first[u], (d - first[u]).days)
            expect[key] = expect.get(key, 0) + 1
    got_r = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in retention_cohorts(df).collect()
    }
    assert got_r == expect


def test_tfidf_fuzz_vs_python_model(spark):
    from etl_gamma_spark.operators.quality import tfidf_top_terms

    rng = random.Random(SEED)
    vocab = [f"t{i}" for i in range(40)]
    rows = [
        (did, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 60))))
        for did in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    tf: dict[tuple, int] = {}
    docs_of: dict[str, set] = {}
    for did, text in rows:
        for w in text.split(" "):
            tf[(did, w)] = tf.get((did, w), 0) + 1
            docs_of.setdefault(w, set()).add(did)
    expect = {}
    by_doc: dict[int, list] = {}
    for (did, w), n in tf.items():
        dfreq = len(docs_of[w])
        by_doc.setdefault(did, []).append((-(n * 1_000_000 // dfreq), w, n, dfreq))
    for did, terms in by_doc.items():
        for rank, (negscore, w, n, dfreq) in enumerate(sorted(terms)[:3], start=1):
            expect[(did, rank)] = (w, n, dfreq, -negscore)

    got = {
        (r.doc_id, r.rank): (r.token, r.tf, r.df, r.score)
        for r in tfidf_top_terms(df).collect()
    }
    assert got == expect


def test_range_bin_join_fuzz_vs_bruteforce(spark):
    """Binned range join == brute-force point-in-interval across random
    bin widths (including widths far larger/smaller than intervals)."""
    from etl_gamma_spark.operators.ranges import range_bin_join

    rng = random.Random(SEED + 1)
    pts = [(i, round(rng.uniform(-50, 150), 3)) for i in range(300)]
    ivs = []
    for j in range(60):
        lo = round(rng.uniform(-60, 140), 3)
        hi = round(lo + rng.uniform(0, 40), 3)
        if rng.random() < 0.1:
            lo, hi = hi, lo + 1  # some inverted intervals
        ivs.append((j, lo, hi))
    p_df = spark.createDataFrame(pts, "pid long, v double")
    i_df = spark.createDataFrame(ivs, "iid long, lo double, hi double")
    expect = {
        (pid, iid)
        for pid, v in pts
        for iid, lo, hi in ivs
        if lo <= v <= hi
    }
    for width in (0.5, 7.3, 200.0):
        got = {
            (r.pid, r.iid)
            for r in range_bin_join(p_df, i_df, "v", "lo", "hi", width).collect()
        }
        assert got == expect, f"width={width}"


def test_interval_overlap_join_fuzz_vs_bruteforce(spark):
    """First-overlap-bin emission == brute-force overlap pairs, each pair
    exactly once, across bin widths."""
    from etl_gamma_spark.operators.ranges import interval_overlap_join

    rng = random.Random(SEED + 2)
    mk = lambda n, tag: [
        (i, rng.randint(-100, 300), 0) for i in range(n)
    ]
    a = [(i, lo, lo + rng.randint(0, 25)) for i, lo, _ in mk(80, "a")]
    b = [(j, lo, lo + rng.randint(0, 25)) for j, lo, _ in mk(70, "b")]
    a_df = spark.createDataFrame(a, "ida long, a_lo long, a_hi long")
    b_df = spark.createDataFrame(b, "idb long, b_lo long, b_hi long")
    expect = sorted(
        (ia, ib)
        for ia, alo, ahi in a
        for ib, blo, bhi in b
        if alo <= bhi and blo <= ahi
    )
    for width in (3, 11, 500):
        rows = interval_overlap_join(
            a_df, b_df, "a_lo", "a_hi", "b_lo", "b_hi", width
        ).collect()
        got = sorted((r.ida, r.idb) for r in rows)
        assert got == expect, f"width={width}"  # == also catches duplicates
