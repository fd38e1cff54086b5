"""Web-corpus catalog entries: URL parse/normalize, domain blocklist
stats, HTML boilerplate extraction, leakage-safe splits, and deterministic
shard shuffling.

The documents table has no URL/HTML columns, so each entry synthesizes a
deterministic fixture from (doc_id, source, text) — the same convention the
multimodal tier uses for binary payloads — and BOTH engines construct the
identical fixture before exercising the real operator chain
(operators/web.py). The operators themselves are generic: they take any
URL/HTML string column.

Scale notes (100 TB): every per-row stage here is a scan-resident codegen
projection (parse_url, regex chains, hash buckets). The only shuffles are
one partial-aggregable groupBy (domain stats), one broadcast anti-join
(blocklist), and the split/shard assignments which reuse the LSH component
output — no new shuffle class is introduced by this tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_ingestion_bra_spark.operators import dedup, graph, web
from data_ingestion_bra_spark.plans.llm_ops import _CLUSTER_CTES, _lsh_dup_components
from data_ingestion_bra_spark.plans.registry import register
from data_ingestion_bra_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Shared URL fixture: deterministic synthesis from (doc_id, source).
# Exercises every normalization branch: uppercase scheme/host, multi-label
# public suffixes, explicit default AND non-default ports, tracking params,
# unsorted params, fragments.
# --------------------------------------------------------------------------
def _synth_url_col() -> F.Column:
    h = F.md5(F.col("doc_id").cast("string"))
    scheme = F.when(F.col("doc_id") % 4 == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    sub = F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    dom = F.concat(F.lit("d"), F.substring(h, 1, 1))
    tld = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("com"))
        .when(F.col("doc_id") % 5 == 1, F.lit("org"))
        .when(F.col("doc_id") % 5 == 2, F.lit("co.uk"))
        .when(F.col("doc_id") % 5 == 3, F.lit("com.br"))
        .otherwise(F.lit("io"))
    )
    port = F.when(F.col("doc_id") % 7 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(F.lit("/"), F.col("source"), F.lit("/p"), F.substring(h, 7, 4))
    query = F.concat(
        F.lit("utm_source=news&z="),
        F.substring(h, 11, 2),
        F.lit("&a="),
        F.substring(h, 13, 2),
    )
    frag = F.when(F.col("doc_id") % 2 == 0, F.lit("#Top")).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), sub, dom, F.lit("."), tld, port, path, F.lit("?"), query, frag
    )


#: DuckDB twin of _synth_url_col (identical string, piece by piece).
_URL_SYNTH_SQL = """
      CASE WHEN doc_id % 4 = 0 THEN 'HTTP' ELSE 'https' END
      || '://'
      || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END
      || 'd' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      || '.'
      || CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
              WHEN 2 THEN 'co.uk' WHEN 3 THEN 'com.br' ELSE 'io' END
      || CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END
      || '/' || source || '/p' || substr(md5(CAST(doc_id AS VARCHAR)), 7, 4)
      || '?utm_source=news&z=' || substr(md5(CAST(doc_id AS VARCHAR)), 11, 2)
      || '&a=' || substr(md5(CAST(doc_id AS VARCHAR)), 13, 2)
      || CASE WHEN doc_id % 2 = 0 THEN '#Top' ELSE '' END
"""

#: Tracking-param predicate GENERATED from the same constant the Spark
#: filter uses (operators/web.py:TRACKING_PREFIXES) — the two engines
#: cannot drift.
_TRACKING_FILTER_SQL = web.tracking_filter_sql("p")

#: DuckDB URL component extraction (regex stand-in for parse_url; verified
#: hash-equal against the JVM parser over the fixture space).
_URL_PARTS_SQL = rf"""
    parts AS (
      SELECT doc_id, n_chars, source, url,
             lower(regexp_extract(url, '^([^:]+)://', 1)) AS scheme,
             lower(regexp_replace(regexp_extract(url, '^[^:]+://([^/]+)', 1),
                                  ':[0-9]+$', '')) AS host,
             regexp_extract(regexp_extract(url, '^[^:]+://([^/]+)', 1),
                            ':([0-9]+)$', 1) AS port,
             regexp_extract(url, '^[^:]+://[^/]+([^?#]*)', 1) AS path,
             regexp_extract(url, '\?([^#]*)', 1) AS query
      FROM urls
    ),
    normed AS (
      SELECT *,
             array_to_string(
               list_sort(list_filter(string_split(query, '&'),
                 p -> NOT ({_TRACKING_FILTER_SQL})
                      AND p <> '')), '&') AS nq,
             string_split(host, '.') AS labels
      FROM parts
    ),
    regd AS (
      SELECT *,
             CASE WHEN labels[-2] || '.' || labels[-1] IN
                       ('co.uk','org.uk','gov.uk','com.br','net.br','com.au',
                        'co.jp','co.in','co.kr','com.mx')
                       AND len(labels) >= 3
                  THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                  ELSE labels[-2] || '.' || labels[-1] END AS registered_domain
      FROM normed
    )
"""

_NORM_URL_SQL = """
    scheme || '://' || host
      || CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                   OR (scheme = 'https' AND port = '443')
              THEN '' ELSE ':' || port END
      || path
      || CASE WHEN nq = '' THEN '' ELSE '?' || nq END
"""


@register(
    "web_url_parse_normalize",
    f"""
    WITH urls AS (SELECT doc_id, n_chars, source, {_URL_SYNTH_SQL} AS url FROM documents),
    {_URL_PARTS_SQL}
    SELECT doc_id, url, scheme, host, port, registered_domain,
           {_NORM_URL_SQL} AS norm_url
    FROM regd
    """,
    tags=("web", "url", "normalize"),
)
def web_url_parse_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing + RFC 3986-ish canonicalization: JVM parse_url for
    components, column algebra for default-port stripping, tracking-param
    removal, param sorting, fragment dropping. All scan-resident — at
    100 TB this is a zero-shuffle projection feeding URL-level dedup."""
    d = load_table(spark, sf_dir, "documents")
    u = d.select("doc_id", "n_chars", "source", _synth_url_col().alias("url"))
    return u.select(
        "doc_id",
        "url",
        web.url_scheme("url").alias("scheme"),
        web.url_host("url").alias("host"),
        web.url_port("url").alias("port"),
        web.registered_domain(web.url_host("url")).alias("registered_domain"),
        web.normalized_url("url").alias("norm_url"),
    )


@register(
    "web_domain_blocklist_stats",
    f"""
    WITH urls AS (SELECT doc_id, n_chars, source, {_URL_SYNTH_SQL} AS url FROM documents),
    {_URL_PARTS_SQL},
    bl AS (SELECT DISTINCT registered_domain FROM regd WHERE doc_id % 37 = 0)
    SELECT r.registered_domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(r.n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT r.host) AS BIGINT) AS n_hosts
    FROM regd r
    LEFT JOIN bl ON bl.registered_domain = r.registered_domain
    WHERE bl.registered_domain IS NULL
    GROUP BY r.registered_domain
    """,
    tags=("web", "blocklist", "domain-stats"),
)
def web_domain_blocklist_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation: drop every document whose registered domain
    is on a blocklist (here: domains seen at doc_id % 37 == 0 — a stand-in
    for a spam/adult/SEO ban list), then per-domain corpus stats. The
    blocklist is broadcast (a real PSL-scale list is ~10^5 rows — always
    broadcastable); the groupBy is partial-aggregable on (domain)."""
    d = load_table(spark, sf_dir, "documents")
    u = d.select("doc_id", "n_chars", _synth_url_col().alias("url"))
    u = u.withColumn("host", web.url_host("url")).withColumn(
        "registered_domain", web.registered_domain("host")
    )
    bl = (
        u.filter(F.col("doc_id") % 37 == 0)
        .select("registered_domain")
        .distinct()
    )
    kept = u.join(F.broadcast(bl), "registered_domain", "left_anti")
    return kept.groupBy("registered_domain").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("host").alias("n_hosts"),
    )


# --------------------------------------------------------------------------
# HTML boilerplate extraction.
# --------------------------------------------------------------------------
_HTML_SYNTH_SQL = """
      '<html><head><title>' || substr(text, 1, 20) || '</title>'
      || '<script>var x=' || doc_id || ';</script>'
      || CASE WHEN doc_id % 2 = 0 THEN '<style>p{color:red}</style>' ELSE '' END
      || '</head><body>'
      || '<nav><a href="/home">Home</a> <a href="/about">About</a></nav>'
      || '<p>' || text || ' Fish &amp; Chips'
      || ' <a href="/ref/' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) || '">'
      || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) || '</a></p>'
      || '<footer>(c) 2026 ' || source || '</footer>'
      || '</body></html>'
"""


def _synth_html_col() -> F.Column:
    h = F.md5(F.col("doc_id").cast("string"))
    style = F.when(F.col("doc_id") % 2 == 0, F.lit("<style>p{color:red}</style>")).otherwise(
        F.lit("")
    )
    return F.concat(
        F.lit("<html><head><title>"),
        F.substring(F.col("text"), 1, 20),
        F.lit("</title>"),
        F.lit("<script>var x="),
        F.col("doc_id").cast("string"),
        F.lit(";</script>"),
        style,
        F.lit("</head><body>"),
        F.lit('<nav><a href="/home">Home</a> <a href="/about">About</a></nav>'),
        F.lit("<p>"),
        F.col("text"),
        F.lit(" Fish &amp; Chips"),
        F.lit(' <a href="/ref/'),
        F.substring(h, 1, 4),
        F.lit('">'),
        F.substring(h, 1, 8),
        F.lit("</a></p>"),
        F.lit("<footer>(c) 2026 "),
        F.col("source"),
        F.lit("</footer>"),
        F.lit("</body></html>"),
    )


def _html_strip_sql(col: str) -> str:
    """DuckDB replay of operators/web.py HTML_STRIP_CHAIN + entity decode +
    whitespace collapse (patterns shared verbatim; RE2-compatible)."""
    x = col
    for pat, rep in web.HTML_STRIP_CHAIN:
        x = f"regexp_replace({x}, '{pat}', '{rep}', 'g')"
    for ent, ch in web.HTML_ENTITIES:
        lit = ch.replace("'", "''")
        x = f"replace({x}, '{ent}', '{lit}')"
    return f"regexp_replace(trim({x}), '\\s+', ' ', 'g')"


@register(
    "text_html_extract",
    f"""
    WITH pages AS (SELECT doc_id, {_HTML_SYNTH_SQL} AS html FROM documents),
    m AS (
      SELECT doc_id, html,
             regexp_extract(html, '(?s)<title[^>]*>(.*?)</title>', 1) AS title,
             CAST((length(html) - length(replace(html, '<a ', ''))) / 3 AS BIGINT)
               AS n_links,
             CAST(coalesce(list_sum(list_transform(
                    regexp_extract_all(html, '<a [^>]*>([^<]*)</a>', 1),
                    s -> length(s))), 0) AS BIGINT) AS anchor_chars,
             {_html_strip_sql('html')} AS main_text
      FROM pages
    )
    SELECT doc_id, title, n_links, anchor_chars,
           CAST(length(main_text) AS BIGINT) AS main_len,
           CAST(FLOOR(anchor_chars / length(main_text) * 10000.0 + 0.5) AS BIGINT)
             AS link_density_e4,
           md5(main_text) AS main_md5
    FROM m
    """,
    tags=("web", "html", "boilerplate", "text"),
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → training text: boilerplate zones (head/script/style/nav/
    header/footer/aside) removed, tags stripped, entities decoded,
    whitespace collapsed — plus the link-density signal (anchor chars /
    main chars) that web-corpus quality filters key on (RefinedWeb,
    CCNet). Whole chain is RE2-compatible regex column algebra: zero
    UDFs, zero shuffles, scan-resident at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    pages = d.select("doc_id", _synth_html_col().alias("html"))
    m = pages.select(
        "doc_id",
        web.html_title("html").alias("title"),
        web.html_link_count("html").alias("n_links"),
        web.html_anchor_chars("html").alias("anchor_chars"),
        web.html_main_text("html").alias("main_text"),
    )
    return m.select(
        "doc_id",
        "title",
        "n_links",
        "anchor_chars",
        F.length("main_text").cast("bigint").alias("main_len"),
        F.floor(F.col("anchor_chars") / F.length("main_text") * 10000.0 + 0.5)
        .cast("bigint")
        .alias("link_density_e4"),
        F.md5("main_text").alias("main_md5"),
    )


# --------------------------------------------------------------------------
# WARC record parsing (ISO 28500 — the Common Crawl container).
# --------------------------------------------------------------------------
def _warc_synth_sql(payload_sql: str = "text", ctype: str = "text/plain") -> str:
    return f"""
      'WARC/1.0' || chr(13) || chr(10)
      || 'WARC-Type: response' || chr(13) || chr(10)
      || 'WARC-Record-ID: <urn:uuid:' || md5(CAST(doc_id AS VARCHAR)) || '>'
      || chr(13) || chr(10)
      || 'WARC-Target-URI: ' || ({_URL_SYNTH_SQL}) || chr(13) || chr(10)
      || 'Content-Type: {ctype}' || chr(13) || chr(10)
      || 'Content-Length: ' || CAST(length({payload_sql}) AS VARCHAR)
      || chr(13) || chr(10)
      || chr(13) || chr(10)
      || {payload_sql}
"""


_WARC_SYNTH_SQL = _warc_synth_sql()


def _synth_warc_col(payload: F.Column | None = None, ctype: str = "text/plain") -> F.Column:
    crlf = "\r\n"
    payload = F.col("text") if payload is None else payload
    return F.concat(
        F.lit("WARC/1.0" + crlf),
        F.lit("WARC-Type: response" + crlf),
        F.lit("WARC-Record-ID: <urn:uuid:"),
        F.md5(F.col("doc_id").cast("string")),
        F.lit(">" + crlf),
        F.lit("WARC-Target-URI: "),
        _synth_url_col(),
        F.lit(crlf),
        F.lit(f"Content-Type: {ctype}" + crlf),
        F.lit("Content-Length: "),
        F.length(payload).cast("string"),
        F.lit(crlf + crlf),
        payload,
    )


@register(
    "web_warc_parse",
    rf"""
    WITH recs AS (SELECT doc_id, {_WARC_SYNTH_SQL} AS rec FROM documents)
    SELECT doc_id,
           regexp_extract(rec, '^WARC/([0-9.]+)\r\n', 1) AS warc_version,
           regexp_extract(rec, 'WARC-Type: ([^\r]*)\r\n', 1) AS warc_type,
           regexp_extract(rec, 'WARC-Target-URI: ([^\r]*)\r\n', 1) AS target_uri,
           CAST(regexp_extract(rec, 'Content-Length: ([^\r]*)\r\n', 1) AS BIGINT)
             AS content_length,
           CAST(length(regexp_extract(rec, '(?s)\r\n\r\n(.*)$', 1)) AS BIGINT)
             AS payload_len,
           md5(regexp_extract(rec, '(?s)\r\n\r\n(.*)$', 1)) AS payload_md5
    FROM recs
    """,
    tags=("web", "warc", "source-format"),
)
def web_warc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC (ISO 28500) record parsing — version line, typed header fields,
    payload split at the blank CRLF line — as scan-resident RE2-safe regex
    projections (operators/web.py). The Common Crawl ingest front door: at
    100 TB each WARC record parses independently inside codegen with zero
    shuffles; payload_md5 doubles as the exact-dedup key so the parse stage
    feeds dedup without a second scan. Header names match case-sensitively
    per the spec's canonical forms."""
    d = load_table(spark, sf_dir, "documents")
    recs = d.select("doc_id", _synth_warc_col().alias("rec"))
    payload = web.warc_payload("rec")
    return recs.select(
        "doc_id",
        web.warc_version("rec").alias("warc_version"),
        web.warc_header("rec", "WARC-Type").alias("warc_type"),
        web.warc_header("rec", "WARC-Target-URI").alias("target_uri"),
        web.warc_header("rec", "Content-Length").cast("bigint").alias("content_length"),
        F.length(payload).cast("bigint").alias("payload_len"),
        F.md5(payload).alias("payload_md5"),
    )


# --------------------------------------------------------------------------
# Leakage-safe splits + deterministic shard shuffle.
# --------------------------------------------------------------------------
@register(
    "corpus_split_leakage_safe",
    _CLUSTER_CTES
    + """,
    assign AS (
      SELECT d.doc_id, d.n_chars,
             coalesce(comp.cluster_id, d.doc_id) AS cluster_id,
             ('0x' || substr(md5('split:' ||
                 CAST(coalesce(comp.cluster_id, d.doc_id) AS VARCHAR)), 1, 6))::BIGINT
               % 100 AS bucket
      FROM documents d LEFT JOIN comp ON comp.doc = d.doc_id
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'valid' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM assign GROUP BY 1
    """,
    tags=("split", "leakage", "dedup", "llm-pipeline"),
)
def corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test assignment: the split unit is the
    NEAR-DUP CLUSTER (MinHash-LSH connected components), not the document —
    so two near-duplicates can never land on opposite sides of a train/test
    boundary (the eval-contamination failure mode). Bucketing hashes the
    cluster id (content-derived, layout-invariant); singleton docs are their
    own cluster. At 100 TB the cluster pass is the already-benched LSH
    pipeline; assignment itself is a broadcast-map projection."""
    d = load_table(spark, sf_dir, "documents")
    comp = _lsh_dup_components(d)
    assign = d.join(comp, d["doc_id"] == comp["doc"], "left").select(
        "doc_id",
        "n_chars",
        F.coalesce(comp["cluster_id"], d["doc_id"]).alias("cluster_id"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))), 1, 6),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    assign = assign.withColumn(
        "split",
        F.when(bucket < 90, F.lit("train")).when(bucket < 95, F.lit("valid")).otherwise(F.lit("test")),
    )
    return assign.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )


@register(
    "corpus_shard_shuffle",
    """
    WITH k AS (
      SELECT doc_id, md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS key
      FROM documents
    ),
    s AS (
      SELECT doc_id, key,
             ('0x' || substr(key, 1, 6))::BIGINT % 16 AS shard,
             ROW_NUMBER() OVER (
               PARTITION BY ('0x' || substr(key, 1, 6))::BIGINT % 16
               ORDER BY key, doc_id) AS pos
      FROM k
    )
    SELECT shard, CAST(pos AS BIGINT) AS pos, doc_id FROM s WHERE pos <= 10
    """,
    tags=("shuffle", "training-order", "llm-pipeline"),
)
def corpus_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: a seeded content hash assigns
    every document to a shard and orders it WITHIN the shard — the standard
    shard+intra-shard-shuffle layout training loaders consume. Reproducible
    across reshards/compactions (depends only on doc_id), and scalable: no
    global total order, so no single-partition sort bottleneck — each shard
    sorts independently (row_number windows per shard key)."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shuf42:"), F.col("doc_id").cast("string")))
    k = d.select("doc_id", key.alias("key"))
    shard = (F.conv(F.substring("key", 1, 6), 16, 10).cast("bigint") % 16).alias("shard")
    s = k.select("doc_id", "key", shard)
    w = Window.partitionBy("shard").orderBy("key", "doc_id")
    return (
        s.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .filter(F.col("pos") <= 10)
        .select("shard", "pos", "doc_id")
    )


# --------------------------------------------------------------------------
# Link-graph quality signal: PageRank in exact integer fixed point.
# --------------------------------------------------------------------------
_PR_SCALE = 1_000_000_000
_PR_DAMPING = 850_000_000

#: Deterministic link graph over 50 "domain" nodes: each document
#: contributes one edge doc_id%50 → (doc_id*31+7)%50 (self-loops dropped,
#: deduped) — a stand-in for the registered-domain link graph a crawler
#: harvests from href targets.
_PR_EDGES_SQL = """
    e AS (
      SELECT DISTINCT doc_id % 50 AS s, (doc_id * 31 + 7) % 50 AS t
      FROM documents WHERE doc_id % 50 <> (doc_id * 31 + 7) % 50
    ),
    nodes AS (SELECT DISTINCT v FROM (SELECT s AS v FROM e UNION ALL SELECT t FROM e)),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT s, COUNT(*) AS outdeg FROM e GROUP BY s)
"""


def _pagerank_oracle(n_iter: int = 5) -> str:
    """Unrolled PageRank rounds (same unroll discipline as the Lloyd/k-means
    oracle generator): all-BIGINT floor-division arithmetic replayed
    identically, so DuckDB reproduces operators/graph.py:pagerank
    bit-for-bit."""
    parts = [
        "WITH " + _PR_EDGES_SQL,
        f""",
    r0 AS (SELECT v, CAST({_PR_SCALE} // nn.n AS BIGINT) AS r FROM nodes, nn)
""",
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
    r{i} AS (
      SELECT n.v,
             CAST(({_PR_SCALE} - {_PR_DAMPING}) // nn.n
               + coalesce(SUM(({_PR_DAMPING} * p.r) // ({_PR_SCALE} * deg.outdeg)), 0)
               AS BIGINT) AS r
      FROM nodes n CROSS JOIN nn
      LEFT JOIN e ON e.t = n.v
      LEFT JOIN r{i - 1} p ON p.v = e.s
      LEFT JOIN deg ON deg.s = e.s
      GROUP BY n.v, nn.n
    )
"""
        )
    parts.append(f"    SELECT v AS node, r AS rank_e9 FROM r{n_iter}")
    return "".join(parts)


@register(
    "web_link_pagerank",
    _pagerank_oracle(5),
    tags=("web", "graph", "pagerank", "quality-signal"),
)
def web_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the (synthesized) domain link graph — the classic
    link-based page/domain quality prior for web-corpus curation (Page et
    al. 1999; OpenWebText/CCNet-era pipelines used link signals as quality
    proxies). operators/graph.py:pagerank runs 5 fixed rounds in exact
    BIGINT fixed point (floor-division contributions, order-free integer
    sums) so the ranks are bit-identical on any engine or partitioning.
    At 100 TB ranks live per registered DOMAIN (~10^7 rows), each round is
    one src equi-join + one partial-aggregable dst groupBy."""
    d = load_table(spark, sf_dir, "documents")
    s = (F.col("doc_id") % 50).alias("s")
    t = ((F.col("doc_id") * 31 + 7) % 50).alias("t")
    edges = d.select(s, t)
    return graph.pagerank(edges, "s", "t", damping_e9=_PR_DAMPING, n_iter=5)


@register(
    "web_link_triangles",
    """
    WITH raw AS (
      SELECT doc_id % 50 AS s, (doc_id * 31 + 7) % 50 AS t FROM documents
    ),
    e AS (
      SELECT DISTINCT LEAST(s, t) AS u, GREATEST(s, t) AS v FROM raw WHERE s <> t
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
      GROUP BY node
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    pn AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM (SELECT a AS node FROM tri
            UNION ALL SELECT b AS node FROM tri
            UNION ALL SELECT c AS node FROM tri)
      GROUP BY node
    )
    SELECT d.node, d.degree,
           CAST(COALESCE(pn.n_triangles, 0) AS BIGINT) AS n_triangles
    FROM deg d LEFT JOIN pn ON pn.node = d.node
    """,
    tags=("web", "graph", "triangles", "quality-signal"),
)
def web_link_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain triangle counts over the same synthesized link graph as
    ``web_link_pagerank`` — the local-clustering signal (link farms and
    spam rings are triangle-dense; organic link neighborhoods are sparse)
    used alongside PageRank as a web-curation quality prior.

    operators/graph.py:triangle_counts runs the degree-ordered-orientation
    scheme: each triangle is enumerated exactly once as a wedge at its
    lowest-(degree, id) vertex, so the wedge self-join is bounded by
    sum(out_deg^2) = O(|E|^1.5) even on power-law graphs where a naive
    orientation explodes quadratically at the hubs. Equi-joins and BIGINT
    counts only; the oracle replays it as the canonical a<b<c triple join
    (provably the same triangle set, affordable at fixture scale)."""
    d = load_table(spark, sf_dir, "documents")
    edges = d.select(
        (F.col("doc_id") % 50).alias("s"),
        ((F.col("doc_id") * 31 + 7) % 50).alias("t"),
    )
    return graph.triangle_counts(edges, "s", "t")


# --------------------------------------------------------------------------
# End-to-end web curation: WARC → HTML → URL policy → quality gate → dedup.
# --------------------------------------------------------------------------
@register(
    "curation_web_pipeline",
    f"""
    WITH pages AS (SELECT doc_id, source, text, {_HTML_SYNTH_SQL} AS html FROM documents),
    recs AS (SELECT doc_id, {_warc_synth_sql("html", "text/html")} AS rec FROM pages),
    parsed AS (
      SELECT doc_id,
             regexp_extract(rec, 'WARC-Target-URI: ([^\r]*)\r\n', 1) AS uri,
             regexp_extract(rec, '(?s)\r\n\r\n(.*)$', 1) AS payload
      FROM recs
    ),
    m AS (
      SELECT doc_id, uri,
             {_html_strip_sql('payload')} AS main_text,
             CAST(coalesce(list_sum(list_transform(
                    regexp_extract_all(payload, '<a [^>]*>([^<]*)</a>', 1),
                    s -> length(s))), 0) AS BIGINT) AS anchor_chars
      FROM parsed
    ),
    hosts AS (
      SELECT doc_id, main_text, anchor_chars,
             string_split(lower(regexp_replace(
               regexp_extract(uri, '^[^:]+://([^/]+)', 1), ':[0-9]+$', '')), '.')
               AS labels
      FROM m
    ),
    regd AS (
      SELECT doc_id, main_text, anchor_chars,
             CASE WHEN labels[-2] || '.' || labels[-1] IN
                       ('co.uk','org.uk','gov.uk','com.br','net.br','com.au',
                        'co.jp','co.in','co.kr','com.mx')
                       AND len(labels) >= 3
                  THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                  ELSE labels[-2] || '.' || labels[-1] END AS registered_domain
      FROM hosts
    ),
    bl AS (SELECT DISTINCT registered_domain FROM regd WHERE doc_id % 37 = 0),
    gated AS (
      SELECT r.doc_id, r.registered_domain,
             md5(r.main_text) AS main_md5,
             CAST(length(r.main_text) AS BIGINT) AS main_len,
             CAST(FLOOR(r.anchor_chars / length(r.main_text) * 10000.0 + 0.5)
                  AS BIGINT) AS link_density_e4
      FROM regd r
      LEFT JOIN bl ON bl.registered_domain = r.registered_domain
      WHERE bl.registered_domain IS NULL
        AND CAST(FLOOR(r.anchor_chars / length(r.main_text) * 10000.0 + 0.5)
                 AS BIGINT) <= 1500
    ),
    canon AS (
      SELECT main_md5, MIN(doc_id) AS doc_id FROM gated GROUP BY main_md5
    )
    SELECT g.doc_id, g.registered_domain, g.main_md5, g.main_len,
           g.link_density_e4
    FROM gated g JOIN canon c ON c.main_md5 = g.main_md5 AND c.doc_id = g.doc_id
    """,
    tags=("web", "pipeline", "curation", "llm-pipeline"),
)
def curation_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Common-Crawl front door END TO END in ONE lazy plan: WARC record
    → target URI + HTML payload → boilerplate-stripped main text +
    link-density → registered-domain blocklist (broadcast anti-join) →
    link-density quality gate (≤ 15%) → exact dedup on the extracted main
    text (keep min doc_id). Everything before the blocklist join is
    scan-resident regex/column algebra; the plan's only shuffles are the
    broadcast anti-join (no shuffle on the big side) and the one
    fingerprint groupBy the dedup needs — the same budget the gated
    curation pipelines run on. This is the composition a RefinedWeb/CCNet
    user would run first at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    pages = d.select("doc_id", "source", "text", _synth_html_col().alias("html"))
    recs = pages.select(
        "doc_id", _synth_warc_col(F.col("html"), "text/html").alias("rec")
    )
    parsed = recs.select(
        "doc_id",
        web.warc_header("rec", "WARC-Target-URI").alias("uri"),
        web.warc_payload("rec").alias("payload"),
    )
    m = parsed.select(
        "doc_id",
        web.registered_domain(
            F.lower(F.regexp_replace(F.regexp_extract("uri", "^[^:]+://([^/]+)", 1), ":[0-9]+$", ""))
        ).alias("registered_domain"),
        web.html_main_text("payload").alias("main_text"),
        web.html_anchor_chars("payload").alias("anchor_chars"),
    )
    m = m.select(
        "doc_id",
        "registered_domain",
        F.md5("main_text").alias("main_md5"),
        F.length("main_text").cast("bigint").alias("main_len"),
        F.floor(F.col("anchor_chars") / F.length("main_text") * 10000.0 + 0.5)
        .cast("bigint")
        .alias("link_density_e4"),
    )
    bl = (
        m.filter(F.col("doc_id") % 37 == 0).select("registered_domain").distinct()
    )
    gated = m.join(F.broadcast(bl), "registered_domain", "left_anti").filter(
        F.col("link_density_e4") <= 1500
    )
    canon = gated.groupBy("main_md5").agg(F.min("doc_id").alias("doc_id"))
    return gated.join(canon, ["main_md5", "doc_id"]).select(
        "doc_id", "registered_domain", "main_md5", "main_len", "link_density_e4"
    )


# --------------------------------------------------------------------------
# robots.txt (RFC 9309) crawl-politeness filter.
# --------------------------------------------------------------------------
#: Per-domain robots fixture: a googlebot group (must NOT leak into the *
#: group), then the * group with one content-derived Disallow prefix, one
#: EMPTY Disallow (allow-all marker — must be ignored), and one prefix that
#: matches nothing.
_ROBOTS_SYNTH_SQL = """
      'User-agent: googlebot' || chr(10) || 'Disallow: /admin' || chr(10)
      || 'User-agent: *' || chr(10)
      || 'Disallow: /src' || substr(md5(registered_domain), 1, 1) || chr(10)
      || 'Disallow: ' || chr(10)
      || 'Disallow: /priv' || chr(10)
"""


def _synth_robots_col() -> F.Column:
    return F.concat(
        F.lit("User-agent: googlebot\nDisallow: /admin\n"),
        F.lit("User-agent: *\n"),
        F.lit("Disallow: /src"),
        F.substring(F.md5(F.col("registered_domain")), 1, 1),
        F.lit("\nDisallow: \nDisallow: /priv\n"),
    )


@register(
    "web_robots_filter",
    f"""
    WITH urls AS (SELECT doc_id, n_chars, source, {_URL_SYNTH_SQL} AS url FROM documents),
    {_URL_PARTS_SQL},
    domains AS (SELECT DISTINCT registered_domain FROM regd),
    rules AS (
      SELECT registered_domain,
             list_filter(
               regexp_extract_all(
                 regexp_extract({_ROBOTS_SYNTH_SQL},
                   '(?s)User-agent: \\*\r?\n(.*?)(?:User-agent: |$)', 1),
                 'Disallow: ([^\r\n]*)', 1),
               p -> p <> '') AS dis
      FROM domains
    )
    SELECT r.doc_id, r.registered_domain, r.path,
           len(list_filter(ru.dis, x -> starts_with(r.path, x))) > 0 AS blocked
    FROM regd r JOIN rules ru USING (registered_domain)
    """,
    tags=("web", "robots", "politeness"),
)
def web_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt (RFC 9309) politeness filtering: parse each domain's
    robots body into the ``User-agent: *`` group's Disallow prefixes
    (operators/web.py:robots_disallow_rules — group-scoped so other
    agents' rules never leak, empty Disallow ignored), broadcast the
    per-domain rule arrays back onto the corpus, and mark every URL whose
    path matches ANY disallowed prefix (the conservative corpus-builder
    policy). At 100 TB the rules relation is one row per domain
    (~10^7 — broadcastable); the prefix test is a row-local ``exists``
    over a tiny array, no join explosion."""
    d = load_table(spark, sf_dir, "documents")
    u = d.select("doc_id", _synth_url_col().alias("url"))
    u = u.select(
        "doc_id",
        web.url_path("url").alias("path"),
        web.registered_domain(web.url_host("url")).alias("registered_domain"),
    )
    rules = (
        u.select("registered_domain")
        .distinct()
        .withColumn("robots", _synth_robots_col())
        .select(
            "registered_domain",
            web.robots_disallow_rules("robots", "*").alias("dis"),
        )
    )
    joined = u.join(F.broadcast(rules), "registered_domain")
    return joined.select(
        "doc_id",
        "registered_domain",
        "path",
        web.robots_blocked("path", F.col("dis")).alias("blocked"),
    )


# --------------------------------------------------------------------------
# Dataset card: the datasheet a training run consumes.
# --------------------------------------------------------------------------
def _dataset_card_oracle() -> str:
    from data_ingestion_bra_spark.operators import bpe as _bpe

    tok_sql = _bpe.doc_token_count_sql("d.text", _bpe.load_merges())
    return (
        _CLUSTER_CTES
        + f""",
    assign AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             {tok_sql} AS n_tok,
             coalesce(comp.cluster_id, d.doc_id) AS cluster_id,
             ('0x' || substr(md5('split:' ||
                 CAST(coalesce(comp.cluster_id, d.doc_id) AS VARCHAR)), 1, 6))::BIGINT
               % 100 AS bucket
      FROM documents d LEFT JOIN comp ON comp.doc = d.doc_id
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'valid' ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens_subword
    FROM assign GROUP BY 1, 2
    """
    )


@register(
    "corpus_dataset_card",
    _dataset_card_oracle(),
    tags=("data-card", "split", "tokenize", "llm-pipeline"),
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DATASHEET a training run consumes ("Datasheets for Datasets",
    Gebru et al. 2021, adapted to corpus curation): per (split, language) —
    documents, near-dup CLUSTERS (the leakage-safe unit the splits are
    keyed by), characters, and the TRAINED-BPE subword token budget (what
    the trainer actually schedules against). One composition of three
    verified tiers: LSH components → cluster-keyed split assignment →
    vocabulary-join BPE token counts (the measured default,
    ``operators/bpe.py`` docstring) → one partial-aggregable groupBy. At
    100 TB the only costs above the already-benched LSH pass are the
    vocabulary join and one small-cardinality aggregate."""
    from data_ingestion_bra_spark.operators import bpe as _bpe

    merges = _bpe.load_merges()
    d = load_table(spark, sf_dir, "documents")
    comp = _lsh_dup_components(d)
    tok = _bpe.doc_token_counts_dense(d, "doc_id", "text", merges, out_col="n_tok")
    assign = (
        d.join(comp, d["doc_id"] == comp["doc"], "left")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.coalesce(comp["cluster_id"], d["doc_id"]).alias("cluster_id"),
        )
        .join(tok, "doc_id")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("cluster_id").cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    assign = assign.withColumn(
        "split",
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("valid"))
        .otherwise(F.lit("test")),
    )
    return assign.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.sum("n_tok").cast("bigint").alias("n_tokens_subword"),
    )


@register(
    "corpus_shard_rendezvous",
    """
    WITH ss AS (SELECT unnest(generate_series(0, 8)) AS s),
    w AS (
      SELECT d.doc_id, ss.s,
             ('0x' || substr(md5(ss.s || ':' || d.doc_id), 1, 12))::BIGINT AS w
      FROM documents d CROSS JOIN ss
    ),
    r8 AS (SELECT doc_id, s,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY w DESC, s DESC) AS rn
           FROM w WHERE s < 8),
    r9 AS (SELECT doc_id, s,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY w DESC, s DESC) AS rn
           FROM w),
    a AS (SELECT e.doc_id,
                 CAST(e.s AS BIGINT) AS shard8,
                 CAST(n.s AS BIGINT) AS shard9
          FROM (SELECT doc_id, s FROM r8 WHERE rn = 1) e
          JOIN (SELECT doc_id, s FROM r9 WHERE rn = 1) n USING (doc_id))
    SELECT shard8, shard9,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(shard8 <> shard9 AS BIGINT) AS moved,
           CAST(shard8 = shard9 OR shard9 = 8 AS BIGINT) AS moved_to_new_only
    FROM a GROUP BY shard8, shard9
    """,
    tags=("sharding", "rendezvous", "consistent-hashing", "infrastructure"),
)
def corpus_shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENDEZVOUS (highest-random-weight) sharding — Thaler & Ravishankar
    1996, the minimal-disruption assignment rule consistent hashing
    popularized, applied to the resharding event a 100 TB corpus actually
    faces: growing 8 shards to 9. Each doc goes to the shard maximizing a
    deterministic md5-prefix weight (a row-local argmax — ZERO shuffles
    for assignment, `operators/sketch.py:rendezvous_shard_expr`), and the
    HRW property is emitted as hash-gated VERDICTS, not prose: every
    (shard8, shard9) cell where the assignment changed must satisfy
    ``shard9 = 8`` (``moved_to_new_only``) — docs only ever move TO the
    new shard, never between existing shards, so resharding copies
    ~1/9 of the corpus instead of reshuffling all of it (contrast
    mod-N hashing, which moves 8/9). The movement fraction itself is
    readable from the n_docs cells.

    Scale shape: assignment is per-row expression work riding the scan;
    the only aggregation is the 16-cell (shard8, shard9) rollup."""
    from data_ingestion_bra_spark.operators.sketch import rendezvous_shard_expr

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    a = d.select(
        rendezvous_shard_expr("doc_id", 8).alias("shard8"),
        rendezvous_shard_expr("doc_id", 9).alias("shard9"),
    )
    return (
        a.groupBy("shard8", "shard9")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select(
            "shard8",
            "shard9",
            "n_docs",
            (F.col("shard8") != F.col("shard9")).cast("bigint").alias("moved"),
            ((F.col("shard8") == F.col("shard9")) | (F.col("shard9") == F.lit(8)))
            .cast("bigint")
            .alias("moved_to_new_only"),
        )
    )


def _lpa_oracle(n_iter: int = 4) -> str:
    """Unrolled synchronous label-propagation rounds (the pagerank-oracle
    unroll discipline): counting + deterministic min-label tie-break only,
    so DuckDB replays operators/graph.py:label_propagation exactly."""
    parts = [
        """
    WITH raw AS (
      SELECT doc_id % 50 AS s, (doc_id * 31 + 7) % 50 AS t FROM documents
    ),
    e AS (
      SELECT DISTINCT LEAST(s, t) AS u, GREATEST(s, t) AS v FROM raw WHERE s <> t
    ),
    sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    adj AS (SELECT u, v FROM sym
            UNION ALL SELECT node AS u, node AS v FROM nodes),
    l0 AS (SELECT node, node AS lbl FROM nodes)
"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
    c{i} AS (
      SELECT a.u AS node, p.lbl, CAST(COUNT(*) AS BIGINT) AS n
      FROM adj a JOIN l{i - 1} p ON p.node = a.v
      GROUP BY a.u, p.lbl
    ),
    r{i} AS (
      SELECT node, lbl,
             ROW_NUMBER() OVER (PARTITION BY node ORDER BY n DESC, lbl ASC) AS rn
      FROM c{i}
    ),
    l{i} AS (
      SELECT p.node, COALESCE(r.lbl, p.lbl) AS lbl
      FROM l{i - 1} p
      LEFT JOIN (SELECT node, lbl FROM r{i} WHERE rn = 1) r ON r.node = p.node
    )
"""
        )
    parts.append(
        f""",
    sizes AS (
      SELECT lbl, CAST(COUNT(*) AS BIGINT) AS community_size
      FROM l{n_iter} GROUP BY lbl
    )
    SELECT l.node, CAST(l.lbl AS BIGINT) AS community, s.community_size
    FROM l{n_iter} l JOIN sizes s ON s.lbl = l.lbl
"""
    )
    return "".join(parts)


@register(
    "web_link_communities_lpa",
    _lpa_oracle(4),
    tags=("web", "graph", "community-detection", "label-propagation"),
)
def web_link_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the same synthesized domain link graph as
    ``web_link_pagerank`` / ``web_link_triangles`` — synchronous label
    propagation (Raghavan et al. 2007) with the deterministic min-label
    tie-break. The web-curation use: pagerank ranks domains GLOBALLY and
    triangles score LOCAL density, but neither names the mirror/spam RING
    itself; LPA's near-linear community assignment is the standard first
    pass for grouping domains into link neighborhoods so per-community
    caps and dedup policies can apply (a community of 400 mutually-linked
    domains with near-identical content is one data source, not 400).

    Determinism: the classic algorithm breaks count ties randomly and
    updates asynchronously — both partitioning-dependent, both replaced
    here (min-label tie-break, synchronous rounds, fixed budget of 4) so
    the assignment is hash-exact; the oracle unrolls the identical rounds
    (the pagerank-oracle discipline). Per round the work is one adjacency
    equi-join + a partial-aggregable (node,label) count + a bounded
    row_number — at a 10^7-node domain graph each round is one shuffle of
    |E| rows, and labels checkpoint per round to truncate lineage."""
    d = load_table(spark, sf_dir, "documents")
    edges = d.select(
        (F.col("doc_id") % 50).alias("s"),
        ((F.col("doc_id") * 31 + 7) % 50).alias("t"),
    )
    return graph.label_propagation(edges, "s", "t", n_iter=4)
