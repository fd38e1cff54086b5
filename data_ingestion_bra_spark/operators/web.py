"""Web/URL processing tier: URL parsing, RFC 3986-ish normalization,
registered-domain (eTLD+1) extraction, tracking-parameter stripping, and
HTML boilerplate removal — the Common-Crawl-shaped front half of an LLM
training-data pipeline (CCNet, RefinedWeb, Gopher all start here).

The reference has no web surface (SURVEY §2 — ABSENT); this tier follows
the same design rules as the rest of the engine:

- **Zero Python UDFs.** URL parsing rides Spark's JVM ``parse_url``
  (Hive semantics, codegen-resident); normalization is pure column
  algebra (``filter``/``array_sort``/``array_join`` over the query
  string); HTML extraction is a chain of ``regexp_replace`` calls whose
  patterns are deliberately RE2-compatible (no backrefs, no lookaround)
  so a DuckDB oracle replays them verbatim.
- **Scan-resident.** Every expression here is a per-row projection: at
  100 TB these run inside WholeStageCodegen on the parquet scan with
  zero shuffles; the only shuffles in the web tier live in the catalog
  queries that aggregate per-domain (one partial-aggregable groupBy) or
  anti-join a blocklist (broadcast).
- **Public knowledge only**: RFC 3986 (normalization), the public
  suffix list *idea* (a tiny inline subset stands in for the full PSL —
  at scale the real list ships as a broadcast lookup, same shape), and
  the usual tracking-param conventions (utm_*, fbclid, gclid).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny public-suffix subset (the full PSL is ~9k rules; at 100 TB it is a
# broadcast map — this inline subset keeps the operator self-contained and
# oracle-replayable). Multi-label suffixes only; everything else is eTLD+1
# = last two labels.
MULTI_SUFFIXES: tuple[str, ...] = (
    "co.uk",
    "org.uk",
    "gov.uk",
    "com.br",
    "net.br",
    "com.au",
    "co.jp",
    "co.in",
    "co.kr",
    "com.mx",
)

#: Query parameters that carry tracking state, not content identity.
#: Entries ending in '_' match as NAME PREFIXES (utm_source, utm_medium…);
#: the rest match the exact param name — valueless ('fbclid') or valued
#: ('fbclid=xyz'). Both ``clean_query`` and the DuckDB twin's predicate
#: (``plans/web.py:_TRACKING_FILTER_SQL``) are GENERATED from this tuple,
#: so the two engines cannot drift (round-7 ADVICE: the constant was dead
#: code and the literal filter let a valueless 'fbclid' survive).
TRACKING_PREFIXES: tuple[str, ...] = ("utm_", "fbclid", "gclid", "msclkid")


def is_tracking_param(p: Column) -> Column:
    """True iff query param ``p`` ('name' or 'name=value') is tracking
    state per ``TRACKING_PREFIXES``."""
    cond = F.lit(False)
    for t in TRACKING_PREFIXES:
        if t.endswith("_"):
            cond = cond | p.startswith(t)
        else:
            cond = cond | (p == t) | p.startswith(t + "=")
    return cond


def tracking_filter_sql(var: str = "p") -> str:
    """The DuckDB lambda-body twin of ``is_tracking_param`` — generated
    from the SAME constant so the oracle predicate can't drift."""
    terms = []
    for t in TRACKING_PREFIXES:
        if t.endswith("_"):
            terms.append(f"starts_with({var}, '{t}')")
        else:
            terms.append(f"{var} = '{t}' OR starts_with({var}, '{t}=')")
    return " OR ".join(terms)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --------------------------------------------------------------------------
# URL component extraction (JVM parse_url; port via authority regex because
# Hive parse_url has no PORT part).
# --------------------------------------------------------------------------
def url_scheme(url: Column | str) -> Column:
    return F.lower(F.parse_url(_col(url), F.lit("PROTOCOL")))


def url_host(url: Column | str) -> Column:
    return F.lower(F.parse_url(_col(url), F.lit("HOST")))


def url_port(url: Column | str) -> Column:
    """Explicit port as a string, '' when absent (regex over AUTHORITY —
    portable to engines without a PORT part in parse_url)."""
    auth = F.parse_url(_col(url), F.lit("AUTHORITY"))
    return F.regexp_extract(auth, ":([0-9]+)$", 1)


def url_path(url: Column | str) -> Column:
    return F.parse_url(_col(url), F.lit("PATH"))


def url_query(url: Column | str) -> Column:
    """Raw query string ('' when absent, matching regexp_extract's
    no-match convention so downstream split/filter never sees NULL)."""
    return F.coalesce(F.parse_url(_col(url), F.lit("QUERY")), F.lit(""))


def clean_query(url: Column | str) -> Column:
    """Tracking params dropped, survivors sorted — canonical param order
    makes syntactically-different-but-equivalent URLs hash-equal, which is
    exactly what URL-level dedup at 100 TB needs."""
    q = url_query(url)
    params = F.split(q, "&")
    keep = F.filter(params, lambda p: ~is_tracking_param(p) & (p != ""))
    return F.array_join(F.array_sort(keep), "&")


def registered_domain(host: Column | str) -> Column:
    """eTLD+1 under the MULTI_SUFFIXES subset: last 2 labels, or last 3
    when the last 2 form a multi-label public suffix (co.uk, com.br, ...)."""
    h = _col(host)
    labels = F.split(h, r"\.")
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3), last2)
    return F.when(
        last2.isin(*MULTI_SUFFIXES) & (F.size(labels) >= 3), last3
    ).otherwise(last2)


def normalized_url(url: Column | str) -> Column:
    """RFC 3986-ish canonical form: lowercase scheme+host, default ports
    stripped (http:80 / https:443), tracking params dropped, remaining
    params sorted, fragment dropped. Pure column algebra — runs in
    codegen on the scan."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    path = url_path(url)
    nq = clean_query(url)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when((port == "") | default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    query_part = F.when(nq == "", F.lit("")).otherwise(F.concat(F.lit("?"), nq))
    return F.concat(scheme, F.lit("://"), host, port_part, path, query_part)


# --------------------------------------------------------------------------
# HTML boilerplate removal (RE2-compatible regex chain; zero UDFs).
# --------------------------------------------------------------------------
#: Ordered (pattern, replacement) chain shared verbatim with the DuckDB
#: oracle. Order matters: zone removal must precede tag stripping.
HTML_STRIP_CHAIN: tuple[tuple[str, str], ...] = (
    (r"(?s)<head[^>]*>.*?</head>", " "),
    (r"(?s)<script[^>]*>.*?</script>", " "),
    (r"(?s)<style[^>]*>.*?</style>", " "),
    (r"(?s)<nav[^>]*>.*?</nav>", " "),
    (r"(?s)<header[^>]*>.*?</header>", " "),
    (r"(?s)<footer[^>]*>.*?</footer>", " "),
    (r"(?s)<aside[^>]*>.*?</aside>", " "),
    (r"<[^>]+>", " "),
)

#: Entity decode pairs applied after tag stripping (plain replace, ordered;
#: &amp; LAST so '&amp;lt;' decodes to '&lt;' not '<').
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

#: Anchor inner text (capture group 1) — RE2-safe, used for link density.
ANCHOR_TEXT_PATTERN = r"<a [^>]*>([^<]*)</a>"


def html_main_text(html: Column | str) -> Column:
    """Main-content text: head/script/style/nav/header/footer/aside zones
    removed, remaining tags stripped, common entities decoded, whitespace
    collapsed. The trafilatura/justext *policy* (boilerplate zones are not
    training text) expressed as a scan-resident regex chain."""
    x = _col(html)
    for pat, rep in HTML_STRIP_CHAIN:
        x = F.regexp_replace(x, pat, rep)
    for ent, ch in HTML_ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return F.regexp_replace(F.trim(x), r"\s+", " ")


def html_title(html: Column | str) -> Column:
    return F.regexp_extract(_col(html), r"(?s)<title[^>]*>(.*?)</title>", 1)


def html_link_count(html: Column | str) -> Column:
    """Count of anchor opens via the replace-length trick (portable; no
    regex count function is common to both engines)."""
    x = _col(html)
    return (
        (F.length(x) - F.length(F.replace(x, F.lit("<a "), F.lit(""))))
        / F.lit(len("<a "))
    ).cast("bigint")


# --------------------------------------------------------------------------
# robots.txt (RFC 9309) — crawl-politeness filtering.
# A rules relation (domain, rule_path) joined per-URL; longest-match wins
# is simplified to ANY-disallow-prefix-match (the conservative reading a
# corpus builder wants: when in doubt, drop). Allow rules can be layered
# the same way; this tier models the Disallow set.
# --------------------------------------------------------------------------
def robots_disallow_rules(robots_txt: Column | str, ua: str = "*") -> Column:
    """Disallow path-prefixes for the given user-agent group, as an array.

    Parses the RFC 9309 group structure with RE2-safe regex: take the
    group headed by ``User-agent: <ua>`` (up to the next User-agent line
    or end), then every ``Disallow: <path>`` value inside it. Empty
    Disallow values (allow-all) are dropped.

    Line endings: RFC 9309 §2.3 allows CR, LF, or CRLF — the delimiters
    accept ``\\r?\\n`` and rule values exclude the trailing ``\\r``
    (round-7 ADVICE: an LF-only parser returned ZERO rules for a CRLF
    robots.txt, silently failing OPEN — the opposite of the module's
    when-in-doubt-drop politeness policy).
    """
    import re as _re

    x = _col(robots_txt)
    group = F.regexp_extract(
        x, rf"(?s)User-agent: {_re.escape(ua)}\r?\n(.*?)(?:User-agent: |$)", 1
    )
    rules = F.regexp_extract_all(group, F.lit(r"Disallow: ([^\r\n]*)"), F.lit(1))
    return F.filter(rules, lambda p: p != "")


def robots_blocked(path: Column | str, rules: Column) -> Column:
    """True iff any disallow prefix matches the URL path (conservative
    any-match policy). ``exists`` over the per-domain rule array — row
    local, no join explosion."""
    p = _col(path)
    return F.exists(rules, lambda r: p.startswith(r))


# --------------------------------------------------------------------------
# WARC record parsing (ISO 28500 / the Common Crawl container format).
# Header block = CRLF-separated "Name: value" lines, terminated by a blank
# CRLF line; everything after is the payload. All RE2-safe regex — the
# DuckDB oracle replays the same patterns.
# --------------------------------------------------------------------------
def warc_header(rec: Column | str, name: str) -> Column:
    """Value of a WARC header field ('' when absent). Case-sensitive match
    on the canonical field name, value runs to the CR."""
    return F.regexp_extract(_col(rec), rf"{name}: ([^\r]*)\r\n", 1)


def warc_version(rec: Column | str) -> Column:
    return F.regexp_extract(_col(rec), r"^WARC/([0-9.]+)\r\n", 1)


def warc_payload(rec: Column | str) -> Column:
    """Payload = everything after the first blank CRLF line."""
    return F.regexp_extract(_col(rec), r"(?s)\r\n\r\n(.*)$", 1)


def html_anchor_chars(html: Column | str) -> Column:
    """Total characters of anchor inner text — numerator of link density
    (boilerplate pages are link-dense; content pages are not)."""
    texts = F.regexp_extract_all(_col(html), F.lit(ANCHOR_TEXT_PATTERN), F.lit(1))
    return F.aggregate(
        texts, F.lit(0).cast("bigint"), lambda acc, s: acc + F.length(s)
    )
