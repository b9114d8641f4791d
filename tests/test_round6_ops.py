"""Independent verification of the round-6 second-batch operators:
portable Bloom semi-join pruning (operators/bloom.py), z-order layout
(operators/layout.py), SemDeDup semantic pruning
(operators/similarity.py::semdedup_prune) and the hashing-trick
classifier (operators/quality.py::hash_classifier_score) — properties
the DuckDB oracle can't express (superset contracts, file layout,
pure-Python recomputation)."""

import hashlib
import math
import os

import pyarrow.parquet as pq
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_gamma_spark.io import load_table
from etl_gamma_spark.operators.bloom import (
    BLOOM_K,
    bloom_positions,
    bloom_prune,
    bloom_semi_join,
)
from etl_gamma_spark.operators.layout import (
    Z_BITS,
    write_zordered_quantized,
    zorder_buckets,
)
from etl_gamma_spark.operators.quality import hash_classifier_score
from etl_gamma_spark.operators.similarity import semdedup_prune
from tests.conftest import SF_SMOKE


# --- bloom ----------------------------------------------------------------


def _keys(spark):
    build = (
        load_table(spark, SF_SMOKE, "customer")
        .filter("c_mktsegment = 'BUILDING'")
        .select("c_custkey")
    )
    probe = load_table(spark, SF_SMOKE, "orders")
    return probe, build


def test_bloom_candidates_are_a_superset_with_low_fp(spark):
    probe, build = _keys(spark)
    cand = bloom_semi_join(probe, build, "o_custkey", "c_custkey", exact=False)
    exact = probe.join(
        build.withColumnRenamed("c_custkey", "o_custkey").distinct(),
        "o_custkey",
        "left_semi",
    )
    cand_keys = {r.o_custkey for r in cand.select("o_custkey").distinct().collect()}
    exact_keys = {r.o_custkey for r in exact.select("o_custkey").distinct().collect()}
    assert exact_keys <= cand_keys, "Bloom must never drop a true match"
    all_keys = probe.select("o_custkey").distinct().count()
    fp = len(cand_keys - exact_keys)
    negatives = all_keys - len(exact_keys)
    n_build = build.distinct().count()
    # theoretical rate for m=65536, k=4 at this n is ~(1-e^{-kn/m})^4;
    # allow 5x slack — the property that matters is "small", not exact
    bound = (1 - math.exp(-BLOOM_K * n_build / 65536)) ** BLOOM_K * 5 + 1e-9
    assert negatives == 0 or fp / negatives <= max(bound, 0.02)


def test_bloom_exact_matches_plain_semi_join(spark):
    probe, build = _keys(spark)
    got = sorted(
        r.o_orderkey
        for r in bloom_semi_join(probe, build, "o_custkey", "c_custkey")
        .select("o_orderkey")
        .collect()
    )
    want = sorted(
        r.o_orderkey
        for r in probe.join(
            build.withColumnRenamed("c_custkey", "o_custkey").distinct(),
            "o_custkey",
            "left_semi",
        )
        .select("o_orderkey")
        .collect()
    )
    assert got == want


def test_bloom_prune_plan_is_broadcast_semi_joins(spark):
    probe, build = _keys(spark)
    plan = bloom_semi_join(
        probe, build, "o_custkey", "c_custkey", exact=False
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= BLOOM_K
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_bloom_positions_match_python_md5(spark):
    rows = [Row(k=v) for v in (1, 42, 99999)]
    got = {
        r.pos
        for r in bloom_positions(spark.createDataFrame(rows), "k").collect()
    }
    want = set()
    for v in (1, 42, 99999):
        dig = hashlib.md5(str(v).encode()).hexdigest()
        for j in range(BLOOM_K):
            want.add(int(dig[8 * j : 8 * j + 8], 16) % 65536)
    assert got == want


# --- z-order --------------------------------------------------------------


def test_zorder_buckets_are_axis_aligned_tiles(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").selectExpr(
        "l_partkey AS x", "l_suppkey AS y"
    )
    rows = (
        zorder_buckets(li, "x", "y", n_buckets=64)
        .groupBy("zbucket")
        .agg({"xq": "min", "yq": "min"})
        .collect()
    )
    maxs = {
        r["zbucket"]: (r["max(xq)"], r["max(yq)"])
        for r in zorder_buckets(li, "x", "y", n_buckets=64)
        .groupBy("zbucket")
        .agg({"xq": "max", "yq": "max"})
        .collect()
    }
    assert len(rows) > 1  # quantization spreads even small-key fixtures
    # 64 buckets = top 3 bits of each quantized dim fixed → tile side 2^13
    side = 1 << (Z_BITS - 3)
    for r in rows:
        mx = maxs[r["zbucket"]]
        assert mx[0] - r["min(xq)"] < side
        assert mx[1] - r["min(yq)"] < side


def test_zorder_zvalue_matches_python_and_sink_writer(spark):
    # corner points quantize to themselves when min=0 and max=65535, so
    # the z-values are the raw interleaves — checkable against Python
    # AND against the Column-form writer (sink.zorder_value must share
    # the exact bit convention: first col odd bits, second col even)
    from etl_gamma_spark.sources.sink import zorder_value

    pts = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame([Row(x=x, y=y) for x, y in pts])
    got = {(r.x, r.y): r.zval for r in zorder_buckets(df, "x", "y").collect()}
    sink_form = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_value(F.col("x"), F.col("y"), Z_BITS).alias("z")
        ).collect()
    }

    def interleave(x, y):
        z = 0
        for j in range(Z_BITS):
            z |= ((x >> j) & 1) << (2 * j + 1)
            z |= ((y >> j) & 1) << (2 * j)
        return z

    for x, y in pts:
        assert got[(x, y)] == interleave(x, y)
        assert sink_form[(x, y)] == interleave(x, y)


def test_write_zordered_quantized_files_are_tiles(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem").selectExpr(
        "l_partkey AS x", "l_suppkey AS y"
    )
    out = str(tmp_path / "zordered")
    write_zordered_quantized(li, out, "x", "y", n_files=16)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert set(back.columns) == {"x", "y"}
    # each written file's x-extent must be far below the global range:
    # footer min/max stats are what readers skip on
    import glob

    spans = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        xs = [
            (
                md.row_group(i).column(0).statistics.min,
                md.row_group(i).column(0).statistics.max,
            )
            for i in range(md.num_row_groups)
        ]
        spans.append(max(mx for _, mx in xs) - min(mn for mn, _ in xs))
    stats = li.selectExpr("max(x) - min(x) AS span").collect()[0]
    assert spans and sorted(spans)[len(spans) // 2] <= stats.span // 2


# --- semdedup -------------------------------------------------------------


def test_semdedup_survivors_partition_and_prune_is_justified(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    kept = semdedup_prune(emb, n_centroids=8, tau=0.3)
    kept_ids = {r.vec_id for r in kept.collect()}
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    assert kept_ids <= all_ids and len(kept_ids) < len(all_ids)

    # brute-force recheck in Python: a pruned id must have an earlier
    # same-cluster neighbor with cosine >= tau; a kept id must not
    rows = emb.selectExpr(
        "vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"
    ).collect()
    vecs = {r.vec_id: r.v for r in rows}
    cents = {r.vec_id: r.v for r in sorted(rows, key=lambda r: r.vec_id)[:8]}

    def d2(a, b):
        return sum((p - q) * (p - q) for p, q in zip(a, b))

    def cos(a, b):
        dot = sum(p * q for p, q in zip(a, b))
        na = math.sqrt(sum(p * p for p in a))
        nb = math.sqrt(sum(q * q for q in b))
        return dot / (na * nb) if na * nb else None

    assign = {
        vid: min(enumerate(cents.values()), key=lambda cv: (d2(v, cv[1]), cv[0]))[0]
        for vid, v in vecs.items()
    }
    for vid in sorted(vecs):
        earlier = [
            u
            for u in vecs
            if u < vid
            and assign[u] == assign[vid]
            and (cos(vecs[u], vecs[vid]) or 0) >= 0.3
        ]
        assert (vid not in kept_ids) == bool(earlier), vid


# --- hash classifier ------------------------------------------------------


def test_hash_classifier_python_recompute(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    got = {
        r.doc_id: (r.margin_micro, r.verdict)
        for r in hash_classifier_score(docs).collect()
    }

    def fid(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 4096

    def weight(f):
        return int(hashlib.md5(str(f).encode()).hexdigest()[:15], 16) % 2001 - 1000

    for row in docs.select("doc_id", "text").collect():
        m = sum(weight(fid(t)) for t in row.text.split(" "))
        assert got[row.doc_id] == (m, "keep" if m > 0 else "drop"), row.doc_id


def test_hash_classifier_collisions_share_weights(spark):
    # two different tokens in the same feature bucket must contribute the
    # same per-occurrence weight — the defining hashing-trick property
    df = spark.createDataFrame([Row(doc_id=1, text="aa bb")])
    out = hash_classifier_score(df).collect()[0]

    def fid(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 4096

    def weight(f):
        return int(hashlib.md5(str(f).encode()).hexdigest()[:15], 16) % 2001 - 1000

    assert out.margin_micro == weight(fid("aa")) + weight(fid("bb"))


# --- HDR percentile sketch ------------------------------------------------


def test_hdr_percentiles_python_recompute_and_error_bound(spark):
    from etl_gamma_spark.operators.sketch import HDR_SUB_BITS, hdr_percentiles

    ev = load_table(spark, SF_SMOKE, "events").selectExpr(
        "event_type", "CAST(FLOOR(value * 1000000) AS BIGINT) AS v"
    )
    got = {
        r.event_type: r
        for r in hdr_percentiles(ev, "v", ["event_type"]).collect()
    }

    s = HDR_SUB_BITS

    def bucket_lo(v):
        e = v.bit_length() - 1
        o = max(e - s, 0)
        idx = o * (1 << s) + (v >> o)
        o_r = max((idx >> s) - 1, 0)
        return (idx - o_r * (1 << s)) << o_r

    rows = ev.filter("v >= 1").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.v)
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        assert got[et].n_values == n
        for q in (50, 95, 99):
            # ceiling-rank convention: the bucket of the ceil(q*n/100)-th
            # smallest value (1-based), reported as its exact lower bound
            exact = vals[max((q * n + 99) // 100, 1) - 1]
            want = bucket_lo(exact)
            have = getattr(got[et], f"p{q}")
            assert have == want, (et, q, have, want)
            # deterministic error contract vs the true quantile value
            assert have <= exact < have + max(have >> s, 1) + (1 << s), (
                et,
                q,
                have,
                exact,
            )


def test_hdr_histograms_merge_by_addition(spark):
    # partial histograms from two halves must give the same percentiles
    # as one pass — the mergeability contract
    from etl_gamma_spark.operators.sketch import hdr_percentiles

    ev = load_table(spark, SF_SMOKE, "events").selectExpr(
        "event_type", "CAST(FLOOR(value * 1000000) AS BIGINT) AS v",
        "event_id",
    )
    whole = {
        r.event_type: (r.n_values, r.p50, r.p95, r.p99)
        for r in hdr_percentiles(ev, "v", ["event_type"]).collect()
    }
    halves = ev.filter("event_id % 2 = 0").unionByName(
        ev.filter("event_id % 2 = 1")
    )
    merged = {
        r.event_type: (r.n_values, r.p50, r.p95, r.p99)
        for r in hdr_percentiles(halves, "v", ["event_type"]).collect()
    }
    assert whole == merged


def test_bloom_positions_persist_and_reuse(spark, tmp_path):
    # the "filter as data" contract: write the position set, read it back
    # (as another job/engine would), and prune with the stored filter —
    # candidates must be identical to the in-memory filter's
    probe, build = _keys(spark)
    positions = bloom_positions(build, "c_custkey")
    path = str(tmp_path / "bloom_positions")
    positions.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    live = {
        r.o_orderkey
        for r in bloom_prune(probe, positions, "o_custkey").select("o_orderkey").collect()
    }
    reused = {
        r.o_orderkey
        for r in bloom_prune(probe, stored, "o_custkey").select("o_orderkey").collect()
    }
    assert live == reused and live


def test_split_leakage_pairs_straddle_only_and_match_neardups(spark):
    import hashlib

    from etl_gamma_spark.operators.similarity import (
        embedding_neardup_pairs,
        split_leakage_pairs,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    leaks = split_leakage_pairs(emb).collect()
    assert leaks, "fixture should contain at least one straddling near-dup"

    def split_of(vid):
        b = int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16) % 100
        return "train" if b < 90 else "test"

    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(emb).select("id_a", "id_b").collect()
    }
    for r in leaks:
        assert r.split_a == split_of(r.id_a) and r.split_b == split_of(r.id_b)
        assert r.split_a != r.split_b
        assert (r.id_a, r.id_b) in pairs
    # completeness: every straddling near-dup pair is reported
    want = {
        (a, b) for a, b in pairs if split_of(a) != split_of(b)
    }
    assert {(r.id_a, r.id_b) for r in leaks} == want


def test_incremental_neardup_matches_batch_pass_and_persisted_index(
    spark, tmp_path
):
    """The incremental path must (1) find exactly the batch↔corpus pairs
    the full-corpus pass finds, and (2) give identical results when the
    index is read back from parquet (the persisted daily-ingest flow)."""
    from etl_gamma_spark.operators.dedup import (
        incremental_neardup_pairs,
        minhash_band_index,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter("doc_id % 10 <> 0")
    batch = docs.filter("doc_id % 10 = 0")

    index = minhash_band_index(corpus).localCheckpoint()
    live = {
        (r.new_id, r.corpus_id): r.est_jaccard
        for r in incremental_neardup_pairs(batch, index).collect()
    }

    # full-corpus pass: keep only pairs straddling the batch/corpus split
    full = {}
    for r in minhash_lsh_pairs(docs).collect():
        a_new, b_new = r.doc_a % 10 == 0, r.doc_b % 10 == 0
        if a_new != b_new:
            new, old = (r.doc_a, r.doc_b) if a_new else (r.doc_b, r.doc_a)
            full[(new, old)] = r.est_jaccard
    assert live == full and live

    path = str(tmp_path / "band_index")
    index.write.mode("overwrite").partitionBy("band").parquet(path)
    stored = spark.read.parquet(path)
    reused = {
        (r.new_id, r.corpus_id): r.est_jaccard
        for r in incremental_neardup_pairs(batch, stored).collect()
    }
    assert reused == live


def test_hdr_bucket_properties_hypothesis(spark):
    """Property test of the HDR bucket arithmetic on adversarial ints:
    monotone index, lower bound <= v, and relative width <= 2^-sub_bits
    (absolute 2^sub_bits for the exact low range)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_gamma_spark.operators.sketch import HDR_SUB_BITS

    s = HDR_SUB_BITS

    def idx_of(v):
        e = v.bit_length() - 1
        o = max(e - s, 0)
        return o * (1 << s) + (v >> o)

    def lo_of(idx):
        o_r = max((idx >> s) - 1, 0)
        return (idx - o_r * (1 << s)) << o_r

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=1, max_value=2**62))
    def check(v):
        idx = idx_of(v)
        lo = lo_of(idx)
        assert lo <= v
        # bucket width: next bucket's lower bound
        hi = lo_of(idx + 1)
        assert v < hi
        assert hi - lo <= max(lo >> s, 1)
        assert idx_of(v + 1) >= idx

    check()

    # and the SQL expression agrees with the Python model on edge values
    from pyspark.sql import Row

    from etl_gamma_spark.operators.sketch import hdr_bucket_exprs

    edge = [1, 2, (1 << s) - 1, 1 << s, (1 << (s + 1)) - 1, 1 << (s + 1),
            12345, 2**40 - 1, 2**40, 2**62]
    idx_e, lo_e = hdr_bucket_exprs("v")
    df = spark.createDataFrame([Row(v=v) for v in edge]).selectExpr(
        "v", f"{idx_e} AS __idx"
    ).selectExpr("v", "__idx", f"{lo_e} AS lo")
    for r in df.collect():
        assert r["__idx"] == idx_of(r.v), r
        assert r.lo == lo_of(idx_of(r.v)), r


def test_schema_diff_reports_drift(spark):
    from etl_gamma_spark.sources.catalog import schema_diff

    a = spark.createDataFrame([], "id BIGINT, x STRING, gone INT")
    b = spark.createDataFrame([], "id BIGINT, x DOUBLE, added DATE")
    got = {
        r.column: (r.status, r.type_a, r.type_b)
        for r in schema_diff(a, b).collect()
    }
    assert got == {
        "gone": ("only_a", "int", None),
        "added": ("only_b", None, "date"),
        "x": ("type_changed", "string", "double"),
    }
    assert schema_diff(a, a).count() == 0


# --- WAV header codec -----------------------------------------------------


def test_wav_parser_reads_stdlib_wave_files_and_skips_junk(spark):
    """The parser must decode REAL WAV bytes (written by Python's stdlib
    `wave` module — an implementation that shares nothing with the Spark
    expressions), and silently skip junk payloads."""
    import io as pyio
    import wave

    from etl_gamma_spark.operators.multimodal import wav_header_stats

    def make_wav(channels, rate, n_samples):
        buf = pyio.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)  # 16-bit
            w.setframerate(rate)
            w.writeframes(b"\x01\x02" * channels * n_samples)
        return buf.getvalue()

    rows = [
        Row(media_id=1, payload=make_wav(1, 8000, 4000)),   # 8000 B data
        Row(media_id=2, payload=make_wav(2, 44100, 441)),   # 1764 B data
        Row(media_id=3, payload=b"not a wav at all"),
        Row(media_id=4, payload=make_wav(1, 8000, 4000)),
    ]
    out = {
        (r.channels, r.sample_rate): (r.n_files, r.total_bytes, r.total_duration_ms)
        for r in wav_header_stats(spark.createDataFrame(rows)).collect()
    }
    # duration: bytes*8000 // (rate*ch*16); 8000B @ 8k mono 16-bit = 500 ms
    assert out == {
        (1, 8000): (2, 16000, 1000),
        (2, 44100): (1, 1764, 10),
    }


def test_synth_wav_payloads_are_valid_wav_files(spark):
    """Round-trip the other way: stdlib `wave` must accept the
    synthesized binaries and report the same parameters the synthesizer
    encoded."""
    import io as pyio
    import wave

    from etl_gamma_spark.operators.multimodal import synth_wav_media

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    for r in synth_wav_media(docs).collect():
        with wave.open(pyio.BytesIO(bytes(r.payload)), "rb") as w:
            doc_id = r.media_id
            assert w.getnchannels() == 1 + doc_id % 2
            assert w.getframerate() == (8000, 16000, 44100)[doc_id % 3]
            assert w.getsampwidth() == 2


def test_png_parser_against_hand_packed_and_zlib_valid_bytes(spark):
    """Cross-check the PNG parse against bytes packed with struct (an
    independent construction), plus junk tolerance; and assert the
    synthesized headers start with the exact 8-byte PNG signature."""
    import struct
    import zlib

    from etl_gamma_spark.operators.multimodal import (
        png_header_stats,
        synth_png_media,
    )

    def make_png_header(w, h):
        ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )

    rows = [
        Row(media_id=1, payload=make_png_header(640, 480)),
        Row(media_id=2, payload=make_png_header(480, 640)),
        Row(media_id=3, payload=make_png_header(100, 100)),
        Row(media_id=4, payload=b"GIF89a junk"),
    ]
    out = {
        r.orientation: (r.n_images, r.total_pixels, r.max_width, r.max_height)
        for r in png_header_stats(spark.createDataFrame(rows)).collect()
    }
    assert out == {
        "landscape": (1, 640 * 480, 640, 480),
        "portrait": (1, 480 * 640, 480, 640),
        "square": (1, 10000, 100, 100),
    }

    docs = load_table(spark, SF_SMOKE, "documents").limit(5)
    for r in synth_png_media(docs).collect():
        b = bytes(r.payload)
        assert b.startswith(b"\x89PNG\r\n\x1a\n")
        w, h = struct.unpack(">II", b[16:24])
        assert w == 64 + r.media_id % 960


# --- delete propagation ---------------------------------------------------


def test_propagate_deletes_erases_across_tables_atomically(spark, tmp_path):
    from etl_gamma_spark.sources.sink import propagate_deletes

    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    t_orders, t_li = str(tmp_path / "orders"), str(tmp_path / "lineitem")
    orders.write.parquet(t_orders)
    li.join(
        orders.select("o_orderkey", "o_custkey"),
        li.l_orderkey == orders.o_orderkey,
    ).select("l_orderkey", "o_custkey", "l_quantity").write.parquet(t_li)

    victims = orders.select("o_custkey").distinct().limit(5)
    victim_set = {r.o_custkey for r in victims.collect()}
    audit = propagate_deletes(
        spark,
        {t_orders: "o_custkey", t_li: "o_custkey"},
        victims,
        key_col="o_custkey",
    )
    for path, col in ((t_orders, "o_custkey"), (t_li, "o_custkey")):
        back = spark.read.parquet(path)
        assert back.filter(back.__getattr__(col).isin(victim_set)).count() == 0
        before, after = audit[path]
        assert after == back.count() < before
    # no leftover scratch or rename-aside dirs
    assert not [p for p in tmp_path.iterdir() if "._" in p.name]


def test_propagate_deletes_preserves_partition_layout(spark, tmp_path):
    # a partitioned warehouse table must come out of erasure still
    # partitioned: a flat rewrite would destroy pruning and duplicate
    # months under the next partition-overwrite write
    from etl_gamma_spark.sources.sink import propagate_deletes

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "mes", F.date_format("o_orderdate", "yyyy-MM")
    )
    t = str(tmp_path / "orders_by_month")
    orders.write.partitionBy("mes").parquet(t)
    victims = orders.select("o_custkey").distinct().limit(5)
    victim_set = {r.o_custkey for r in victims.collect()}
    n_parts_kept = (
        orders.filter(~orders.o_custkey.isin(victim_set))
        .select("mes").distinct().count()
    )

    propagate_deletes(spark, {t: "o_custkey"}, victims, key_col="o_custkey")

    # layout survived: one mes= directory per surviving month, none
    # flattened (a month whose every row was erased rightly disappears)
    dirs = [d for d in os.listdir(t) if d.startswith("mes=")]
    assert len(dirs) == n_parts_kept > 0
    assert not [f for f in os.listdir(t) if f.endswith(".parquet")]
    back = spark.read.parquet(t)
    assert "mes" in back.columns  # still a partition column on read
    assert back.filter(back.o_custkey.isin(victim_set)).count() == 0
    # and the table still accepts a partition-scoped overwrite cleanly
    one_month = sorted(d.split("=", 1)[1] for d in dirs)[0]
    repl = back.filter(F.col("mes") == one_month).limit(3)
    (
        repl.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("mes")
        .parquet(t)
    )
    assert spark.read.parquet(t).filter(F.col("mes") == one_month).count() == 3


# --- versioned snapshots --------------------------------------------------


def test_versioned_writes_time_travel_and_expiry(spark, tmp_path):
    import os

    from etl_gamma_spark.sources.sink import (
        expire_versions,
        read_version,
        write_versioned,
    )

    root = str(tmp_path / "table")
    orders = load_table(spark, SF_SMOKE, "orders")
    v1 = write_versioned(orders.limit(10), root)
    v2 = write_versioned(orders.limit(25), root)
    assert (v1, v2) == (1, 2)
    assert read_version(spark, root).count() == 25          # committed latest
    assert read_version(spark, root, 1).count() == 10       # time travel

    # a crashed write (data dir present, pointer never swapped) must stay
    # invisible to latest-readers
    os.makedirs(os.path.join(root, "v=3"))
    spark.range(1).write.mode("overwrite").parquet(os.path.join(root, "v=3"))
    assert read_version(spark, root).count() == 25

    v4 = write_versioned(orders.limit(40), root)
    assert v4 == 4 and read_version(spark, root).count() == 40
    expired = expire_versions(root, keep=2)
    assert 1 in expired and not os.path.exists(os.path.join(root, "v=1"))
    assert read_version(spark, root).count() == 40
    assert read_version(spark, root, 3) is not None  # kept (newest 2 + latest)


# --- SCD2 history ---------------------------------------------------------


def test_scd2_history_collapses_episodes_and_handles_nulls(spark):
    import datetime as dt

    from etl_gamma_spark.operators.cdc import scd2_history

    t = lambda m: dt.datetime(2001, 1, 1, 0, m)  # noqa: E731
    rows = [
        # key 1: A A B A  -> episodes A(2) B(1) A(1)
        Row(k=1, v="A", ts=t(0), i=0),
        Row(k=1, v="A", ts=t(1), i=1),
        Row(k=1, v="B", ts=t(2), i=2),
        Row(k=1, v="A", ts=t(3), i=3),
        # key 2: NULL NULL X NULL -> NULL(2) X(1) NULL(1)
        Row(k=2, v=None, ts=t(0), i=4),
        Row(k=2, v=None, ts=t(1), i=5),
        Row(k=2, v="X", ts=t(2), i=6),
        Row(k=2, v=None, ts=t(3), i=7),
        # same-ts tiebreak: order by (ts, i)
        Row(k=3, v="P", ts=t(0), i=8),
        Row(k=3, v="Q", ts=t(0), i=9),
    ]
    out = scd2_history(
        spark.createDataFrame(rows), ["k"], ["v"], "ts", ["i"]
    ).collect()
    hist = {}
    for r in sorted(out, key=lambda r: (r.k, r.valid_from, r.n_events)):
        hist.setdefault(r.k, []).append(
            (r.v, r.valid_from.minute, None if r.valid_to is None else r.valid_to.minute,
             r.is_current, r.n_events)
        )
    assert hist[1] == [("A", 0, 2, 0, 2), ("B", 2, 3, 0, 1), ("A", 3, None, 1, 1)]
    assert hist[2] == [(None, 0, 2, 0, 2), ("X", 2, 3, 0, 1), (None, 3, None, 1, 1)]
    assert hist[3] == [("P", 0, 0, 0, 1), ("Q", 0, None, 1, 1)]
    # exactly one current row per key; intervals chain without gaps
    for k, eps in hist.items():
        assert sum(e[3] for e in eps) == 1
        for a, b in zip(eps, eps[1:]):
            assert a[2] == b[1]


def test_scd2_history_rejects_empty_value_cols(spark):
    import pytest as _pt

    from etl_gamma_spark.operators.cdc import scd2_history

    df = spark.createDataFrame([Row(k=1, ts=1, i=0)])
    with _pt.raises(ValueError, match="value column"):
        scd2_history(df, ["k"], [], "ts", ["i"])


# --- URL canonicalization / dedup / domain mix ------------------------------

import pytest
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").cache()
    yield df
    df.unpersist()


def test_canon_url_collapses_every_variant_class(spark):
    from etl_gamma_spark.operators.web import canon_url_expr

    variants = [
        "HTTP://WWW.Src3.News.com:80/articles/page-5/?id=5#ref",
        "http://src3.news.com/articles/page-5?utm_campaign=x&id=5",
        "http://src3.news.com/articles/page-5?id=5&utm_source=feed&fbclid=f9",
        "http://www.src3.news.com:80/articles/page-5?id=5",
        "http://SRC3.news.com/articles/page-5/?id=5&gclid=abc#frag",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    got = {r.c for r in df.selectExpr(f"{canon_url_expr('url', 'spark')} AS c").collect()}
    assert got == {"http://src3.news.com/articles/page-5?id=5"}
    # distinct logical pages must NOT collapse
    other = spark.createDataFrame(
        [("http://src3.news.com/articles/page-6?id=6",),
         ("https://src3.news.com/articles/page-5?id=5",),
         ("http://src4.news.com/articles/page-5?id=5",)],
        "url string",
    )
    keys = {r.c for r in other.selectExpr(f"{canon_url_expr('url', 'spark')} AS c").collect()}
    assert len(keys) == 3


def test_url_dedup_keep_first_and_counts(spark, docs):
    from etl_gamma_spark.operators.web import url_dedup, with_urls

    du = with_urls(docs)
    out = url_dedup(du)
    rows = out.collect()
    # total variants across groups == corpus size; keeper is the min id
    assert sum(r.n_variants for r in rows) == docs.count()
    sample = out.filter("n_variants > 1").limit(5).collect()
    got = {r.canonical_url: r.keep_id for r in rows}
    from etl_gamma_spark.operators.web import canon_url_expr

    back = du.selectExpr("doc_id", f"{canon_url_expr('url', 'spark')} AS c").collect()
    by_key = {}
    for r in back:
        by_key.setdefault(r.c, []).append(r.doc_id)
    for url, ids in by_key.items():
        assert got[url] == min(ids)
    if sample:
        assert all(r.keep_id is not None for r in sample)


def test_domain_mix_shares_are_half_up_permille(spark, docs):
    from etl_gamma_spark.operators.web import domain_mix, with_urls

    rows = domain_mix(with_urls(docs)).collect()
    assert {r.domain for r in rows} <= {"news.com", "blog.org", "wiki.net"}
    total = sum(r.n_chars for r in rows)
    for r in rows:
        expect = (2000 * r.n_chars + total) // (2 * total)
        assert r.share_permille == expect


def test_html_extract_strips_boilerplate_and_unescapes(spark, docs):
    from etl_gamma_spark.operators.web import html_extract, with_html

    out = html_extract(with_html(docs)).orderBy("doc_id").limit(5).collect()
    assert len(out) == 5
    for r in out:
        assert "Home" not in r.clean_text and "About" not in r.clean_text
        assert "<p>" not in r.clean_text and "&amp;" not in r.clean_text
        assert r.clean_text.endswith('Tom & Jerry <3 "quoted"')
        assert r.clean_chars == len(r.clean_text)
        assert "  " not in r.clean_text


def test_html_extract_multiline_blocks_and_mismatched_tags(spark):
    """Per-tag strip patterns: a multi-line <script> block dies ((?s)
    dotall), and an open <nav> cannot be 'closed' by </style> — the old
    combined alternation over-deleted the KEEP content between them."""
    from etl_gamma_spark.functions.text import SPARK
    from etl_gamma_spark.operators.web import html_to_text_expr

    html = (
        "<html><body>"
        "<script>\nvar x = 1;\nalert(x);\n</script>"
        "<nav>menu</nav> <p>KEEP-A</p> <style>.c {}</style>"
        " <p>KEEP-B</p></body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    got = df.selectExpr(f"{html_to_text_expr('html', SPARK)} AS t").first().t
    assert got == "KEEP-A KEEP-B"
    # mismatched pairing must not delete content between <nav> and </style>
    html2 = "<body><nav>m</nav> <p>SURVIVES</p> <style>x</style> end</body>"
    df2 = spark.createDataFrame([(html2,)], "html string")
    got2 = df2.selectExpr(f"{html_to_text_expr('html', SPARK)} AS t").first().t
    assert got2 == "SURVIVES end"
    # a LONGER tag sharing the prefix (<nav-bar>) must not open a nav
    # deletion span — its tags strip like any other element, content kept
    html3 = (
        "<body><nav-bar>menu text</nav-bar> <p>KEEP</p>"
        ' <nav class="m">real nav</nav> tail</body>'
    )
    df3 = spark.createDataFrame([(html3,)], "html string")
    got3 = df3.selectExpr(f"{html_to_text_expr('html', SPARK)} AS t").first().t
    assert got3 == "menu text KEEP tail"
    # HTML allows any whitespace between tag name and attributes — a
    # newline-separated attribute must still open the strip span
    # (ADVICE r7: the space-only boundary let these blocks survive)
    html4 = (
        '<body><script\ntype="text/javascript">\nvar y = 2;\n</script>'
        " <p>KEPT</p> <style\n media=\"print\">.x{}</style> tail</body>"
    )
    df4 = spark.createDataFrame([(html4,)], "html string")
    got4 = df4.selectExpr(f"{html_to_text_expr('html', SPARK)} AS t").first().t
    assert got4 == "KEPT tail"
    # underscore and non-ASCII are valid custom-element name characters:
    # <nav_menu> / <navü> must NOT open a nav deletion span (ADVICE r8 —
    # the boundary is now a whitelist of whitespace and '/')
    html5 = (
        "<body><nav_menu>custom text</nav_menu> <p>HELD</p>"
        " <navü>exotic</navü> <nav>real</nav> tail</body>"
    )
    df5 = spark.createDataFrame([(html5,)], "html string")
    got5 = df5.selectExpr(f"{html_to_text_expr('html', SPARK)} AS t").first().t
    assert got5 == "custom text HELD exotic tail"
    # self-closing form still opens a span (boundary '/')
    html6 = "<body><nav/>gone</nav> <p>STAYS</p></body>"
    df6 = spark.createDataFrame([(html6,)], "html string")
    got6 = df6.selectExpr(f"{html_to_text_expr('html', SPARK)} AS t").first().t
    assert got6 == "STAYS"
    # and the DuckDB twin renders the same values
    import duckdb

    from etl_gamma_spark.functions.text import DUCK as DUCKDB

    con = duckdb.connect()
    for h, want in (
        (html, "KEEP-A KEEP-B"),
        (html2, "SURVIVES end"),
        (html3, "menu text KEEP tail"),
        (html4, "KEPT tail"),
        (html5, "custom text HELD exotic tail"),
        (html6, "STAYS"),
    ):
        sql = f"SELECT {html_to_text_expr('h', DUCKDB)} AS t FROM (SELECT ? AS h)"
        assert con.execute(sql, [h]).fetchone()[0] == want


def test_k_anonymity_flags_small_groups(spark):
    from etl_gamma_spark.operators.stats import k_anonymity_report

    df = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, None)],
        "nat int, seg string",
    )
    got = {r.seg: (r.group_n, r.at_risk)
           for r in k_anonymity_report(df, ["seg"], k=3).collect()}
    assert got["A"] == (3, 0)
    assert got["B"] == (1, 1)
    assert got[None] == (1, 1)  # NULL quasi-values form their own class
    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_anonymity_report(df, [], k=3)


def test_psi_drift_detects_shift_and_matches_python_model(spark):
    import math

    from etl_gamma_spark.operators.stats import psi_drift

    # base ~ bins 0-3, curr shifted up — PSI must be clearly positive
    base = spark.createDataFrame([(float(i % 4),) for i in range(200)], "v double")
    curr = spark.createDataFrame([(float(i % 4 + 4),) for i in range(200)], "v double")
    rows = psi_drift(base, curr, "v", "1.0", 10).collect()
    total = float(sum(r.psi_term for r in rows))
    assert total > 0.5, total
    # identical distributions -> every term exactly 0
    same = psi_drift(base, base, "v", "1.0", 10).collect()
    assert all(float(r.psi_term) == 0.0 for r in same)
    # python recomputation of one bin (true-ln model, loose tolerance —
    # the portable log is within 1e-8 of math.log)
    na = {r.bin: r.n_base for r in rows}
    nb = {r.bin: r.n_curr for r in rows}
    for b in na:
        p = (na[b] + 1) / (sum(na.values()) + 10)
        q = (nb[b] + 1) / (sum(nb.values()) + 10)
        expect = (p - q) * math.log(p / q)
        got = float(next(r.psi_term for r in rows if r.bin == b))
        assert abs(got - expect) < 1e-6, (b, got, expect)


# --- BPE training ----------------------------------------------------------


def _py_bpe(word_counts, n_merges):
    """Pure-Python reference BPE: greedy-left fold application, argmax by
    (count DESC, lhs, rhs) — the exact contract of operators/tokenize.py."""
    syms = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = {}
        for w, c in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, n))
        for w in syms:
            out = []
            for x in syms[w]:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_bpe_train_matches_python_reference_on_fixture(spark, docs):
    from etl_gamma_spark.operators.tokenize import bpe_train, word_histogram

    counts = {r.word: r.n for r in word_histogram(docs).collect()}
    want = _py_bpe(counts, 8)
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(docs, n_merges=8).orderBy("merge_rank").collect()
    ]
    assert got == want


def test_bpe_fold_handles_symbol_runs_greedily(spark):
    # 'aaaaaa' must fold greedily to [aa, aa, aa] after merging (a, a) —
    # a non-greedy / non-overlapping-replace application would leave
    # stray 'a' symbols and round 2 would not see (aa, aa) dominate
    from etl_gamma_spark.operators.tokenize import bpe_train

    df = spark.createDataFrame(
        [(1, "aaaaaa aaaaaa")], "doc_id long, text string"
    )
    rows = bpe_train(df, n_merges=2).orderBy("merge_rank").collect()
    # round 1: (a, a) appears 5x per word x2 words
    assert (rows[0].lhs, rows[0].rhs, rows[0].pair_count) == ("a", "a", 10)
    # greedy: each word is now [aa, aa, aa, </w>] -> (aa, aa) = 2x2 = 4,
    # beating (aa, </w>) = 2; any non-greedy application breaks this
    assert (rows[1].lhs, rows[1].rhs, rows[1].pair_count) == ("aa", "aa", 4)


def test_jpeg_dims_match_python_walker_and_survive_junk(spark):
    from etl_gamma_spark.operators.multimodal import jpeg_dims, synth_jpeg_media
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=100 + 7 * i, text=f"t{i}") for i in range(12)]
    )
    media = synth_jpeg_media(docs)

    def py_walk(b: bytes):
        if b[:2] != b"\xff\xd8":
            return None
        off = 2
        for _ in range(4):
            marker = b[off:off + 2]
            if marker in (b"\xff\xc0", b"\xff\xc2"):
                return (
                    int.from_bytes(b[off + 7:off + 9], "big"),   # width
                    int.from_bytes(b[off + 5:off + 7], "big"),   # height
                )
            off = off + 2 + int.from_bytes(b[off + 2:off + 4], "big")
        return None

    raw = {r.media_id: bytes(r.payload) for r in media.collect()}
    want = {mid: py_walk(p) for mid, p in raw.items()}
    got = {r.media_id: (r.width, r.height) for r in jpeg_dims(media).collect()}
    assert got == {k: v for k, v in want.items() if v is not None}
    assert len(got) == 12
    # the COM padding varies per row, so SOF offsets genuinely differ
    assert len({len(p) for p in raw.values()}) > 1

    # junk rows (not JPEG / truncated) are dropped, never fatal
    junk = spark.createDataFrame(
        [Row(media_id=100, payload=bytearray(b"not a jpeg")),
         Row(media_id=101, payload=bytearray(b"\xff\xd8\xff\xe0\x00"))],
    )
    both = media.unionByName(junk)
    out = jpeg_dims(both).collect()
    assert {r.media_id for r in out} == set(range(12))


def _py_bpe_encode(word_counts, merges):
    """Reference BPE encoder: re-scan for the MIN-RANK applicable pair
    after every application (a single pass in rank order is wrong — a
    later merge can create an earlier pair), greedy-left fusion."""
    ranks = {(a, b): r for r, a, b, _n in merges}
    toks = {}
    for w, c in word_counts.items():
        s = list(w) + ["</w>"]
        while True:
            best = None
            for i in range(len(s) - 1):
                r = ranks.get((s[i], s[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, s[i], s[i + 1])
            if best is None:
                break
            _, a, b = best
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            s = out
        for t in s:
            toks[t] = toks.get(t, 0) + c
    return toks


def test_bpe_encode_matches_python_reference_on_fixture(spark, docs):
    from etl_gamma_spark.operators.tokenize import (
        bpe_encode,
        bpe_train,
        word_histogram,
    )

    counts = {r.word: r.n for r in word_histogram(docs).collect()}
    want = _py_bpe_encode(counts, _py_bpe(counts, 8))
    got = {
        r.token: r.n_tokens
        for r in bpe_encode(docs, bpe_train(docs, n_merges=8)).collect()
    }
    assert got == want


def test_bpe_encode_rescans_for_newly_formed_lower_rank(spark):
    # merges: rank 1 = (a, bc), rank 2 = (b, c). Encoding "abc" must
    # apply rank 2 FIRST (rank 1 is not yet present), then re-scan and
    # apply rank 1 on the newly-formed adjacency -> one "abc" token.
    # A single pass in rank order stops at [a, bc] — the classic bug.
    from etl_gamma_spark.operators.tokenize import bpe_encode

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    merges = spark.createDataFrame(
        [(1, "a", "bc"), (2, "b", "c")], "merge_rank int, lhs string, rhs string"
    )
    got = {r.token: r.n_tokens for r in bpe_encode(docs, merges).collect()}
    assert got == {"abc": 1, "</w>": 1}
