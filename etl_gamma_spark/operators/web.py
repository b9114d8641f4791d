"""Web-corpus URL operators (extension surface; the C4/CommonCrawl-style
curation steps every web-scale training pipeline runs before any text
processing): URL canonicalization, duplicate-URL collapse, and per-domain
corpus mix accounting.

The fixture tables carry no URL column, so — like the WAV/PNG codecs in
multimodal.py — the carriers SYNTHESIZE a deterministic messy ``url``
column from fixture rows (same expression in both dialects), then run the
real operators on it. The mess covers the classic canonicalization
classes: scheme/host case, ``www.`` prefix, explicit default port,
trailing slash, tracking query parameters (utm_*/fbclid/gclid) in any
position, and fragments.

Everything here is plain string/regex arithmetic (conservative RE2-safe
patterns, no backslash escapes — character classes only, identical in
Java and RE2 regex dialects), so every step is bit-exact across engines
and fully oracle-checkable.

Scale posture: canonicalization is a narrow per-row projection (codegen,
no shuffle); url_dedup is one hash aggregate on the canonical key with
map-side combine (keep-first as a reducible MIN, never a window); the
domain mix is a two-level aggregation whose second level is a 1-row
broadcast — nothing here concentrates a hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (house import style)

from ..functions import text as T
from ..io import spread

S = T.SPARK

# tracking parameters stripped by canonicalization (match anywhere in the
# query string; the trailing '&?' swallows the separator of a following
# kept parameter, and a leftover trailing '&' is cleaned afterwards)
_TRACKING = "(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*&?"


def synth_url_expr(doc_id: str, source: str, d: str) -> str:
    """Deterministic messy URL from (doc_id, source).

    Documents sharing (source, doc_id % 23) are variants of the SAME
    logical page dressed differently — scheme case, www., host case,
    explicit :80, trailing slash, tracking params (leading or trailing),
    fragment — so canonicalization must collapse them to one key.
    """
    page = T.tostr(f"({doc_id} % 23)", d)
    tld = f"(CAST(regexp_extract({source}, '([0-9]+)$', 1) AS INT) % 3)"
    suffix = (
        f"CASE WHEN {tld} = 0 THEN '.news.com' "
        f"WHEN {tld} = 1 THEN '.blog.org' ELSE '.wiki.net' END"
    )
    scheme = f"CASE WHEN {doc_id} % 3 = 0 THEN 'HTTP' ELSE 'http' END"
    www = f"CASE WHEN {doc_id} % 2 = 0 THEN 'www.' ELSE '' END"
    hostcore = f"CASE WHEN {doc_id} % 5 = 0 THEN upper({source}) ELSE {source} END"
    port = f"CASE WHEN {doc_id} % 7 = 0 THEN ':80' ELSE '' END"
    slash = f"CASE WHEN {doc_id} % 11 = 0 THEN '/' ELSE '' END"
    query = (
        f"CASE WHEN {doc_id} % 13 = 0 THEN concat('?utm_campaign=news&id=', {page}) "
        f"WHEN {doc_id} % 2 = 1 THEN concat('?id=', {page}, "
        f"'&utm_source=feed&fbclid=f', {T.tostr(doc_id, d)}) "
        f"ELSE concat('?id=', {page}) END"
    )
    frag = f"CASE WHEN {doc_id} % 17 = 0 THEN '#ref2' ELSE '' END"
    return (
        f"concat({scheme}, '://', {www}, {hostcore}, {suffix}, {port}, "
        f"'/articles/page-', {page}, {slash}, {query}, {frag})"
    )


def canon_host_expr(url: str, d: str) -> str:  # noqa: ARG001 (dialect-same)
    """Canonical host: lowercased authority, ``www.`` and default ports
    stripped. Anchored patterns match at most once, so the engines'
    differing regexp_replace global defaults cannot diverge here."""
    hostport = f"lower(regexp_extract({url}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    return (
        f"regexp_replace(regexp_replace({hostport}, '^www[.]', ''), "
        f"':(80|443)$', '')"
    )


def canon_url_expr(url: str, d: str) -> str:
    """Full canonical URL: lowercase scheme + canonical host + path with
    the trailing slash trimmed + query with tracking params removed
    (fragment dropped). The only unanchored replace (tracking-param
    strip) goes through T.regex_strip, which pins DuckDB's 'g' flag."""
    scheme = f"lower(regexp_extract({url}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host = canon_host_expr(url, d)
    path = (
        f"regexp_replace(regexp_extract({url}, '://[^/?#]*([^?#]*)', 1), "
        f"'/+$', '')"
    )
    query0 = f"regexp_extract({url}, '[?]([^#]*)', 1)"
    query = f"regexp_replace({T.regex_strip(query0, _TRACKING, d)}, '[&]+$', '')"
    qpart = f"CASE WHEN {query} = '' THEN '' ELSE concat('?', {query}) END"
    return f"concat({scheme}, '://', {host}, {path}, {qpart})"


def domain_expr(host: str, d: str) -> str:  # noqa: ARG001 (dialect-same)
    """Registrable domain: the last two dot-labels of the canonical host
    (the C4 dedup/blocklist key — 'src3.news.com' → 'news.com')."""
    return f"regexp_extract({host}, '([^./:]+[.][^./:]+)$', 1)"


def with_urls(documents: DataFrame) -> DataFrame:
    """Attach the deterministic synthetic ``url`` column (carrier input)."""
    return spread(documents).selectExpr(
        "*", f"{synth_url_expr('doc_id', 'source', S)} AS url"
    )


def url_dedup(docs_with_url: DataFrame, url_col: str = "url") -> DataFrame:
    """Collapse URL-level duplicates: one keeper per canonical URL.

    Output: (canonical_url, keep_id = lowest doc_id, n_variants). The
    keeper is a reducible MIN aggregate — map-side combined, hot-URL-safe
    (house rule: never a row_number window for keep-first).
    """
    return (
        docs_with_url.selectExpr(
            f"{canon_url_expr(url_col, S)} AS canonical_url", "doc_id"
        )
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").cast("long").alias("n_variants"),
        )
    )


def domain_mix(docs_with_url: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registrable-domain corpus accounting: document count, character
    mass, and each domain's HALF_UP permille share of total characters
    (the 'what is my corpus made of / what do I cap' report; integer-DIV
    rounding per the repo's decimal-division parity rule).

    Output: (domain, n_docs, n_chars, share_permille).
    """
    per = (
        docs_with_url.selectExpr(
            f"{domain_expr(canon_host_expr(url_col, S), S)} AS domain",
            "n_chars",
        )
        .groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    total = per.agg(F.sum("n_chars").cast("long").alias("__total"))
    from .similarity import bcast_attach

    return bcast_attach(per, total, "domain", "__total").selectExpr(
        "domain",
        "n_docs",
        "n_chars",
        f"CAST({T.idiv('(2000 * n_chars + __total)', '(2 * __total)', S)} AS BIGINT)"
        " AS share_permille",
    )


# --- HTML → text extraction -------------------------------------------------


def synth_html_expr(doc_id: str, source: str, text: str, d: str) -> str:
    """Deterministic HTML page wrapping a fixture document: head/title,
    a nav boilerplate block (must NOT survive extraction), heading,
    body paragraphs, and escaped entities."""
    return (
        f"concat('<html><head><title>', {source}, ' #', {T.tostr(doc_id, d)}, "
        f"'</title></head><body>', "
        f"'<nav class=\"menu\"><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav>', "
        f"'<h1>', {source}, '</h1> <p>', {text}, '</p> ', "
        f"'<p>Tom &amp; Jerry &lt;3 &quot;quoted&quot;</p>', "
        f"'</body></html>')"
    )


def html_to_text_expr(html: str, d: str) -> str:
    """Main-content text from an HTML string (trafilatura-lite, pure
    regex — the per-row projection shape of the C4 extraction step):

    1. drop boilerplate container blocks (nav/script/style, non-greedy);
    2. strip every remaining tag;
    3. unescape the common entities (&amp; LAST, per the standard);
    4. squeeze runs of spaces and trim.

    Non-greedy ``.*?`` and the character-class-only patterns behave
    identically in Java regex and RE2; no backslash escapes anywhere.
    One pattern PER tag name, so an opening <nav> can only be closed by
    </nav> (a combined alternation lets <nav>...</style> over-delete
    content between mismatched tags), and the ``(?s)`` dotall flag —
    supported by both Java regex and RE2 — makes ``.`` cross newlines so
    multi-line script/style blocks are removed too.
    """
    t0 = html
    for tag in ("nav", "script", "style"):
        # tag-boundary form <tag(<delimiter> attrs)?>: plain <{tag}[^>]*>
        # would prefix-match a LONGER tag name (<nav-bar>, <style-guide>)
        # and open a deletion span through the next real closing tag. The
        # boundary is a WHITELIST of the only characters HTML permits
        # between a tag name and what follows — whitespace (space, tab,
        # LF, CR, FF) or the self-closing '/' — written as literal
        # characters (no backslash escapes, identical in Java regex and
        # RE2). The earlier negated-class form ([^>a-zA-Z0-9-]) rejected
        # hyphenated longer names but still admitted underscore and
        # non-ASCII name characters, so <nav_menu> or <navü> opened a nav
        # deletion span (ADVICE r8).
        t0 = T.regex_strip(
            t0, f"(?s)<{tag}([ \t\n\r\x0c/][^>]*)?>.*?</{tag}>", d
        )
    # tags become SPACES (not ''): block boundaries must separate words —
    # '</title><h1>' gluing adjacent text is the classic extractor bug
    if d == S:
        t1 = f"regexp_replace({t0}, '<[^>]*>', ' ')"
    else:
        t1 = f"regexp_replace({t0}, '<[^>]*>', ' ', 'g')"
    t2 = (
        f"replace(replace(replace(replace({t1}, "
        f"'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&amp;', '&')"
    )
    if d == S:
        squeezed = f"regexp_replace({t2}, '[ ]+', ' ')"
    else:
        squeezed = f"regexp_replace({t2}, '[ ]+', ' ', 'g')"
    return f"trim({squeezed})"


def with_html(documents: DataFrame) -> DataFrame:
    """Attach the deterministic synthetic ``html`` column (carrier input)."""
    return spread(documents).selectExpr(
        "*", f"{synth_html_expr('doc_id', 'source', 'text', S)} AS html"
    )


def html_extract(docs_with_html: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, clean_text, clean_chars): extracted main content. A
    narrow codegen projection — no shuffle, no Python; at 100 TB this is
    the map stage in front of every text operator in this package."""
    return docs_with_html.selectExpr(
        "doc_id",
        f"{html_to_text_expr(html_col, S)} AS clean_text",
    ).selectExpr("doc_id", "clean_text", "length(clean_text) AS clean_chars")
