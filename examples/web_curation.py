#!/usr/bin/env python3
"""End-to-end web-corpus curation walkthrough — the LLM-training-data
side of this engine, composed from the same operators the registered
queries exercise:

    raw HTML pages
      → main-content extraction        (operators/web.py)
      → URL canonicalization + dedup   (operators/web.py)
      → domain mix accounting          (operators/web.py)
      → Gopher quality gates           (operators/quality.py)
      → MinHash near-dup clustering    (operators/dedup.py)
      → one representative per cluster (operators/dedup.py)
      → deterministic train/val/test   (operators/quality.py)

Run from the repo root: python examples/web_curation.py
(fixture documents stand in for a crawl; the synthetic url/html columns
are deterministic functions of the fixture rows).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_gamma_spark.io import load_table
from etl_gamma_spark.operators.dedup import (
    cluster_prune,
    minhash_lsh_pairs,
    neardup_clusters,
)
from etl_gamma_spark.operators.quality import dataset_split, gopher_repetition
from etl_gamma_spark.operators.web import (
    domain_mix,
    html_extract,
    url_dedup,
    with_html,
    with_urls,
)
from etl_gamma_spark.session import get_spark

spark = get_spark("web-curation")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
docs = with_urls(with_html(load_table(spark, sf_dir, "documents")))

# 1. HTML → main text (nav/script boilerplate dropped, entities unescaped)
clean = html_extract(docs)
print("extracted:", clean.count(), "documents")

# 2. collapse URL-level duplicates (mirrors, tracking params, casing)
keepers = url_dedup(docs)
print("canonical URLs:", keepers.count(), "(from", docs.count(), "fetches)")

# 3. what is the corpus made of? (cap/blocklist decisions start here)
domain_mix(docs).show()

# 4. Gopher repetition/quality gates
gated = gopher_repetition(docs).filter("gopher_pass").select("doc_id")
print("pass quality gates:", gated.count())

# 5. near-duplicate clustering (banded MinHash LSH, df-capped) and
#    one-representative-per-cluster pruning
pairs = minhash_lsh_pairs(docs)
clusters = neardup_clusters(docs, pairs)
survivors = cluster_prune(docs, clusters)
print("after near-dup prune:", survivors.count())

# 6. deterministic stratified split (pure function of doc_id — re-runs,
#    backfills and incremental ingests always agree)
dataset_split(docs).orderBy("source", "split").show(9)

spark.stop()
