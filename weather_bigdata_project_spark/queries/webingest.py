"""Web-ingest queries: the crawl-side front door of an LLM data
pipeline, as oracle-gated operators — HTML -> text extraction and
WARC -> record parsing (operators/webtext.py holds the real kernels).

Gating pattern (same as the PPM/WAV/Y4M/JPEG/PNG real-kernel gates):
the wire payload is synthesized deterministically Spark-side from the
documents table, the genuine parser runs in one Arrow-batched
mapInPandas stage, and the DuckDB oracle predicts every output with
string/length arithmetic — so the parser state machines (tag walk with
the quoted-'>'-attribute trap, script/style subtree drops, entity
decoding; WARC version line + Content-Length block slicing + record
separators + nested HTTP parse) are hash-checked end to end while the
oracle never runs a parser.

ref: the reference ingests a REST weather API (NiFi_Flow.json:1) and
has no crawl surface; this extends the north-star corpus-curation
family, where HTML extraction and WARC walking are stages 1 and 0 of
the standard corpus build (Common Crawl ships WARC; C4/CCNet/RefinedWeb
all begin at exactly these two parsers).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import textops as T
from ..operators import webtext as W
from ..registry import query

# --- HTML -> text ----------------------------------------------------------

#: the synthesized page: every parser trap the extractor must survive —
#: a <style> and a <script> whose CONTENT contains markup-lookalike
#: text, a comment, a quoted attribute containing '>', named + numeric
#: + nbsp entities — with single spaces between block elements so text
#: nodes carry their separators. Tag count is structure-constant: 18
#: real tags + 2 markup-lookalikes inside the script (counted by the
#: walk before the skip check, deliberately: the walk SEES them and
#: must not emit them).
_HTML_PREFIX = (
    '<!DOCTYPE html><html> <head><title>Doc '
)
_HTML_MID = (
    '</title> <style>p{color:red}</style> '
    '<script type="text/javascript">var x = "<p>not text</p>";</script> '
    '</head> <body> <!-- crawl metadata: lang='
)
_HTML_H1 = (
    ' --> <h1 class="t" title="a>b">Q&amp;A &lt;notes&gt;</h1> <p>'
)
_HTML_SUFFIX = '</p> <p>&#36;end&nbsp;of&nbsp;doc</p> </body></html>'


@query(
    "corpus_html_extract",
    oracle=(
        "SELECT doc_id, "
        "'Q&A <notes> ' || text || ' $end of doc' AS extracted, "
        "CAST(20 AS INT) AS n_tags, "
        "CAST(2 AS INT) AS n_dropped_blocks, "
        "CAST(1 AS INT) AS n_comments "
        "FROM documents WHERE length(text) >= 1"
    ),
)
def corpus_html_extract(spark, sf_dir):
    """REAL HTML text extraction — the trafilatura/jusText job every
    web-crawl pipeline runs before any quality or dedup operator sees a
    byte of text, reduced to its load-bearing state machine and
    hash-gated: each doc's text is wrapped in a synthesized page
    carrying the classic parser traps (a <script> whose string content
    contains '<p>…</p>' markup that must NOT leak into the text, a
    <style> block, an HTML comment, a quoted attribute value containing
    '>' that must not close its tag, and named/numeric/nbsp entities),
    and the extractor must recover exactly the body text — entities
    decoded, whitespace collapsed, head/script/style/comments dropped.
    The DuckDB oracle predicts the output by pure string concatenation
    from the original text, so any state-machine defect (leaking script
    content, truncating at the attribute '>', mis-decoding an entity,
    keeping head text) changes the extracted string and fails the
    driver hash. One Arrow-batched mapInPandas stage; page markup is
    synthesized in-row and never shuffles."""
    d = (
        T.docs(spark, sf_dir)
        .filter(F.length("text") >= 1)
        .select("doc_id", _html_col().alias("html"))
    )
    return W.html_extract(d)


def _html_col():
    """The synthesized page as a Column over the documents row."""
    return F.concat(
        F.lit(_HTML_PREFIX),
        F.col("doc_id").cast("string"),
        F.lit(_HTML_MID),
        F.col("lang"),
        F.lit(_HTML_H1),
        F.col("text"),
        F.lit(_HTML_SUFFIX),
    )


# --- WARC record walk ------------------------------------------------------

_WARCINFO_BODY = "software: spark-graft/1.0\r\n"
_HTTP_PRE = (
    "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\nContent-Length: "
)

#: the warcinfo record, constant for every stream — named so the
#: .warc.gz oracle can predict its gzip-trailer ISIZE closed-form
_REC0 = (
    "WARC/1.1\r\nWARC-Type: warcinfo\r\n"
    + "Content-Length: " + str(len(_WARCINFO_BODY.encode())) + "\r\n"
    + "\r\n" + _WARCINFO_BODY + "\r\n\r\n"
)

#: response-record framing pieces, named so oracles can length-sum them
_REC1_P1 = (
    "WARC/1.1\r\nWARC-Type: response\r\n"
    "WARC-Target-URI: http://example.com/doc/"
)
_REC1_P2 = "\r\nContent-Length: "


def _warc_oracle() -> str:
    # response-record Content-Length = len(HTTP status+headers) +
    # digits of the body length + CRLFCRLF + body bytes — all length
    # arithmetic the oracle computes without building a byte of WARC
    http_len = (
        f"{len(_HTTP_PRE)} + "
        "length(CAST(octet_length(encode(text)) AS VARCHAR)) + 4 + "
        "octet_length(encode(text))"
    )
    return (
        "SELECT doc_id, CAST(0 AS INT) AS record_idx, "
        "'warcinfo' AS warc_type, "
        f"CAST({len(_WARCINFO_BODY.encode())} AS BIGINT) "
        "AS content_length, "
        "CAST(NULL AS INT) AS http_status, "
        "CAST(NULL AS BIGINT) AS payload_len, "
        "CAST(NULL AS VARCHAR) AS body_text "
        "FROM documents WHERE length(text) >= 1 "
        "UNION ALL "
        "SELECT doc_id, CAST(1 AS INT), 'response', "
        f"CAST({http_len} AS BIGINT), "
        "CAST(200 AS INT), CAST(octet_length(encode(text)) AS BIGINT), text "
        "FROM documents WHERE length(text) >= 1"
    )


@query("corpus_warc_records", oracle=_warc_oracle())
def corpus_warc_records(spark, sf_dir):
    """REAL WARC (ISO 28500) parsing — the container format web crawls
    actually ship (Common Crawl is billions of WARC records; stage 0 of
    every crawl-derived corpus is exactly this walk): each doc becomes
    a two-record WARC stream (a warcinfo record, then a response record
    whose block is a genuine HTTP/1.1 response carrying the doc text),
    synthesized in-row by pure string concatenation, and the real
    parser walks it back — version line, CRLF headers to the blank
    line, exactly Content-Length block bytes, the mandatory CRLF CRLF
    record separator, then the nested HTTP parse (status line, headers,
    body sliced by the HTTP Content-Length). The DuckDB oracle predicts
    every field by length arithmetic (the response record's
    Content-Length is a closed-form function of the text's byte
    length), so an off-by-one anywhere in the record walk or the HTTP
    slicing changes a value and fails the driver hash. Payload bytes
    never shuffle; at crawl scale this stage maps over WARC files
    exactly as written."""
    d = (
        T.docs(spark, sf_dir)
        .filter(F.length("text") >= 1)
        .select("doc_id", _warc_wrap(F.col("text")).alias("content"))
    )
    return W.warc_records(d)


def _warc_wrap(body):
    """Two-record WARC stream (warcinfo + HTTP response carrying
    `body`) as a binary Column over the documents row."""
    crlf = "\r\n"
    http = F.concat(
        F.lit(_HTTP_PRE),
        F.octet_length(body).cast("string"),
        F.lit(crlf + crlf),
        body,
    )
    rec1 = F.concat(
        F.lit(_REC1_P1),
        F.col("doc_id").cast("string"),
        F.lit(_REC1_P2),
        F.octet_length(http).cast("string"),
        F.lit(crlf + crlf),
        http,
        F.lit(crlf + crlf),
    )
    return F.encode(F.concat(F.lit(_REC0), rec1), "utf-8")


# --- the composed crawl front door -----------------------------------------


def _crawl_oracle() -> str:
    # octet length of the synthesized page, closed-form from the row
    html_len = (
        f"{len(_HTML_PREFIX.encode())} + "
        "length(CAST(doc_id AS VARCHAR)) + "
        f"{len(_HTML_MID.encode())} + octet_length(encode(lang)) + "
        f"{len(_HTML_H1.encode())} + octet_length(encode(text)) + "
        f"{len(_HTML_SUFFIX.encode())}"
    )
    clen = (
        f"{len(_HTTP_PRE)} + "
        f"length(CAST(({html_len}) AS VARCHAR)) + 4 + ({html_len})"
    )
    return (
        "SELECT doc_id, CAST(2 AS INT) AS n_records, "
        f"CAST({clen} AS BIGINT) AS content_length, "
        "CAST(20 AS INT) AS n_tags, "
        "CAST(5 + len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
        "CAST(24 + length(text) AS BIGINT) AS n_chars "
        "FROM documents WHERE length(text) >= 1"
    )


@query("corpus_crawl_extract_stats", oracle=_crawl_oracle())
def corpus_crawl_extract_stats(spark, sf_dir):
    """The crawl front door COMPOSED, end to end: each doc's text is
    wrapped in the trap-laden HTML page, the page is wrapped in a
    genuine HTTP/1.1 response inside a two-record WARC stream, and ONE
    Arrow-batched stage walks it all back — real WARC record slicing,
    real HTTP parse, real HTML extraction — emitting the recovered
    text's token and character counts. This is stage 0+1 of a
    C4/CCNet-class corpus build as a single verified operator; the
    oracle predicts every output closed-form from the original row
    (the response record's Content-Length is a two-level length
    recursion over the page's byte length; token count is the text's
    plus the page banner's 5), so an off-by-one in ANY of the three
    parsers shifts a value and fails the driver hash. Payloads are
    built and parsed in-row and never shuffle."""
    d = (
        T.docs(spark, sf_dir)
        .filter(F.length("text") >= 1)
        .select("doc_id", _warc_wrap(_html_col()).alias("content"))
    )
    return W.crawl_extract_stats(d)


# --- .warc.gz: gzip members, the Common Crawl wire format -------------------


def _warc_gz_oracle() -> str:
    # ISIZE of each member = the exact byte length of the record it
    # holds — rec0 is a constant, rec1 is a two-level length recursion
    # over the text's byte length, all computable without gzip
    blen = "octet_length(encode(text))"
    clen = f"{len(_HTTP_PRE)} + length(CAST({blen} AS VARCHAR)) + 4 + {blen}"
    rec1_len = (
        f"{len(_REC1_P1.encode())} + length(CAST(doc_id AS VARCHAR)) + "
        f"{len(_REC1_P2.encode())} + "
        f"length(CAST(({clen}) AS VARCHAR)) + 4 + ({clen}) + 4"
    )
    return (
        "SELECT doc_id, CAST(0 AS INT) AS member_idx, "
        "'warcinfo' AS warc_type, "
        f"CAST({len(_WARCINFO_BODY.encode())} AS BIGINT) "
        "AS content_length, "
        f"CAST({len(_REC0.encode())} AS BIGINT) AS isize, "
        "CAST(NULL AS INT) AS http_status, "
        "CAST(NULL AS BIGINT) AS payload_len, "
        "CAST(NULL AS VARCHAR) AS body_text "
        "FROM documents WHERE length(text) >= 1 "
        "UNION ALL "
        "SELECT doc_id, CAST(1 AS INT), 'response', "
        f"CAST({clen} AS BIGINT), CAST({rec1_len} AS BIGINT), "
        f"CAST(200 AS INT), CAST({blen} AS BIGINT), text "
        "FROM documents WHERE length(text) >= 1"
    )


@query("corpus_warc_gz_records", oracle=_warc_gz_oracle())
def corpus_warc_gz_records(spark, sf_dir):
    """REAL .warc.gz parsing — the wire format web crawls actually ship
    (Common Crawl is per-record gzip members concatenated, so a reader
    can seek to any record and inflate just it; identity-encoded WARC
    as in corpus_warc_records is the uncompressed special case): each
    doc's two-record WARC stream is re-framed record-per-gzip-member by
    the hand-rolled RFC 1952 writer (FNAME header field, raw-deflate
    body, CRC32 + ISIZE trailer), and the REAL member walker parses it
    all back — header-field walk honoring every FLG-declared optional
    field, zlib raw-deflate inflation, trailer verification against the
    inflated bytes — before the inner WARC/HTTP record parse. The
    DuckDB oracle predicts every output closed-form (each member's
    ISIZE is exactly its record's byte length — a constant for the
    warcinfo member, a two-level length recursion over the text's byte
    length for the response member), so a framing bug in EITHER gzip
    half or either parser layer shifts a value and fails the driver
    hash — without the oracle touching gzip. zlib itself is already
    hash-proven in-tree by the PNG codec; this composes it with the
    crawl container. One Arrow-batched stage; payloads never shuffle."""
    d = (
        T.docs(spark, sf_dir)
        .filter(F.length("text") >= 1)
        .select("doc_id", _warc_wrap(F.col("text")).alias("content"))
    )
    return W.warc_gz_records(d)


# --- chunked transfer-encoding: the other real-crawl HTTP body shape --------

_HTTP_CHUNKED_PRE = (
    "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
    "Transfer-Encoding: chunked\r\n\r\n"
)


def _chunked_wrap():
    """WARC response record whose HTTP body uses Transfer-Encoding:
    chunked — two chunks split at the body's byte midpoint, hex sizes,
    the 0-size last chunk — as a binary Column over the documents row.
    Pure codegen binary/string ops; no Python in the synthesis."""
    def b(s):
        return F.encode(F.lit(s), "utf-8")

    body = F.encode(F.col("text"), "utf-8")
    n = F.octet_length(body)
    s1 = F.expr("(octet_length(encode(text, 'utf-8')) + 1) div 2")
    s2 = n - s1
    crlf = b("\r\n")
    http = F.concat(
        b(_HTTP_CHUNKED_PRE),
        F.encode(F.conv(s1.cast("string"), 10, 16), "utf-8"), crlf,
        F.substring(body, F.lit(1), s1), crlf,
        F.encode(F.conv(s2.cast("string"), 10, 16), "utf-8"), crlf,
        F.substring(body, s1 + F.lit(1), s2), crlf,
        b("0\r\n\r\n"),
    )
    return F.concat(
        b(_REC1_P1),
        F.encode(F.col("doc_id").cast("string"), "utf-8"),
        b(_REC1_P2),
        F.encode(F.octet_length(http).cast("string"), "utf-8"),
        b("\r\n\r\n"),
        http,
        b("\r\n\r\n"),
    )


def _warc_chunked_oracle() -> str:
    n = "octet_length(encode(text))"
    s1 = f"((({n}) + 1) // 2)"
    s2 = f"(({n}) - {s1})"
    clen = (
        f"{len(_HTTP_CHUNKED_PRE)} + "
        f"length(to_hex({s1})) + 2 + {s1} + 2 + "
        f"length(to_hex({s2})) + 2 + {s2} + 2 + 5"
    )
    return (
        "SELECT doc_id, CAST(0 AS INT) AS record_idx, "
        "'response' AS warc_type, "
        f"CAST({clen} AS BIGINT) AS content_length, "
        "CAST(200 AS INT) AS http_status, "
        f"CAST({n} AS BIGINT) AS payload_len, "
        "text AS body_text "
        "FROM documents WHERE length(text) >= 2"
    )


@query("corpus_warc_chunked", oracle=_warc_chunked_oracle())
def corpus_warc_chunked(spark, sf_dir):
    """REAL chunked transfer-decoding inside the WARC walk — the other
    HTTP body shape real crawl captures carry (origin servers stream
    dynamic pages chunked; the capture stores the raw bytes, so the
    corpus parser must reassemble them): each doc's text becomes a
    WARC response record whose HTTP block declares Transfer-Encoding:
    chunked and carries the body as two hex-sized chunks split at the
    byte midpoint plus the 0-size terminator, synthesized entirely
    JVM-side (codegen binary concat + conv-to-hex + binary substring —
    multibyte-safe because the split is on BYTES and reassembly
    precedes decoding). The REAL dechunker walks the size lines,
    slices each chunk, demands every framing CRLF and the empty
    trailer section, and the record's Content-Length is a closed-form
    sum over the text's byte length and the hex-digit counts — so an
    off-by-one in the chunk walk or a split that broke a multibyte
    character changes content_length or body_text and fails the driver
    hash. One Arrow-batched stage; payloads never shuffle."""
    d = (
        T.docs(spark, sf_dir)
        .filter(F.length("text") >= 2)
        .select("doc_id", _chunked_wrap().alias("content"))
    )
    return W.warc_records(d)


# --- URL canonicalization + URL-level dedup ----------------------------------

#: the three mess variants a crawler actually sees for one page —
#: uppercase scheme/host + default port + tracking param + fragment;
#: www. prefix + tracking param + shuffled param order; already-clean
_URL_V0 = (
    "'HTTPS://WWW.Example-' || CAST(page_id % 5 AS STRING) || "
    "'.COM:443/doc/' || CAST(page_id AS STRING) || '/?b=' || "
    "CAST(page_id % 97 AS STRING) || '&utm_source=feed&a=' || "
    "CAST(page_id % 7 AS STRING) || '#sec'"
)
_URL_V1 = (
    "'https://www.example-' || CAST(page_id % 5 AS STRING) || "
    "'.com/doc/' || CAST(page_id AS STRING) || '/?utm_campaign=x&b=' || "
    "CAST(page_id % 97 AS STRING) || '&a=' || "
    "CAST(page_id % 7 AS STRING)"
)
_URL_V2 = (
    "'https://example-' || CAST(page_id % 5 AS STRING) || "
    "'.com/doc/' || CAST(page_id AS STRING) || '/?a=' || "
    "CAST(page_id % 7 AS STRING) || '&b=' || "
    "CAST(page_id % 97 AS STRING)"
)

_URL_CANON_ORACLE = (
    "WITH d AS (SELECT doc_id, doc_id // 2 AS page_id FROM documents), "
    "c AS (SELECT doc_id, page_id, "
    "'https://example-' || CAST(page_id % 5 AS VARCHAR) || '.com' "
    "AS host_part, "
    "'https://example-' || CAST(page_id % 5 AS VARCHAR) || '.com/doc/' "
    "|| CAST(page_id AS VARCHAR) || '/?a=' || "
    "CAST(page_id % 7 AS VARCHAR) || '&b=' || "
    "CAST(page_id % 97 AS VARCHAR) AS canonical_url, "
    "CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE 1 END AS INT) "
    "AS n_dropped_params FROM d) "
    "SELECT doc_id, canonical_url, "
    "replace(host_part, 'https://', '') AS host, n_dropped_params, "
    "CAST(COUNT(*) OVER (PARTITION BY canonical_url) AS BIGINT) "
    "AS group_size, "
    "doc_id = MIN(doc_id) OVER (PARTITION BY canonical_url) "
    "AS is_survivor "
    "FROM c"
)


@query("corpus_url_canonicalize", oracle=_URL_CANON_ORACLE)
def corpus_url_canonicalize(spark, sf_dir):
    """URL canonicalization + URL-level dedup — the stage every crawl
    pipeline runs BEFORE content dedup (RefinedWeb/CCNet fetch logs
    carry the same page under uppercase hosts, default ports, www
    prefixes, tracking params, fragments; collapsing them first is
    orders of magnitude cheaper than letting MinHash find the copies):
    each doc gets one of three real-world mess variants of its page's
    URL, and the REAL canonicalization chain — Spark's parse_url
    (java.net.URI) splitting protocol/authority/path/query/fragment,
    scheme+host lowercasing, default-port stripping, www stripping,
    fragment dropping, tracking-param (utm_*) removal, query-param
    sorting, reassembly — must recover the identical canonical form
    from all three, after which a canonical-keyed window picks the
    lowest-doc_id survivor per page. The DuckDB oracle predicts every
    canonical string closed-form from page_id (never parsing a URL),
    so a defect anywhere in the chain — a port left behind, params
    unsorted, the fragment kept — splits a group or shifts a string
    and fails the driver hash. All-JVM codegen expressions; the only
    shuffle is the canonical-keyed window, linear in docs, and at
    100 TB the survivor pick is the same first-copy-wins hash agg any
    URL-frontier dedup runs."""
    d = T.docs(spark, sf_dir).selectExpr(
        "doc_id", "doc_id div 2 AS page_id"
    )
    url = (
        f"CASE WHEN doc_id % 3 = 0 THEN {_URL_V0} "
        f"WHEN doc_id % 3 = 1 THEN {_URL_V1} "
        f"ELSE {_URL_V2} END"
    )
    raw = d.selectExpr("doc_id", f"{url} AS url")
    q_kept = (
        "array_sort(filter(split(parse_url(url, 'QUERY'), '&'), "
        "x -> x NOT LIKE 'utm_%'))"
    )
    canon = raw.selectExpr(
        "doc_id",
        "lower(parse_url(url, 'PROTOCOL')) || '://' || "
        "regexp_replace(regexp_replace(lower(parse_url(url, "
        "'AUTHORITY')), ':443$', ''), '^www\\\\.', '') || "
        "parse_url(url, 'PATH') || '?' || "
        f"array_join({q_kept}, '&') AS canonical_url",
        "regexp_replace(regexp_replace(lower(parse_url(url, "
        "'AUTHORITY')), ':443$', ''), '^www\\\\.', '') AS host",
        "CAST(size(split(parse_url(url, 'QUERY'), '&')) - "
        f"size({q_kept}) AS INT) AS n_dropped_params",
    )
    w = Window.partitionBy("canonical_url")
    return canon.select(
        "doc_id",
        "canonical_url",
        "host",
        "n_dropped_params",
        F.count("*").over(w).alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias(
            "is_survivor"
        ),
    )


# --- robots.txt: the crawl-politeness gate -----------------------------------

#: the synthesized politeness file: a deny-all default group (so a
#: group-selection bug flips every verdict), a two-agent specific
#: group with a wildcard+anchor disallow, a longest-match pair, an
#: order-adversarial TIE (Disallow listed first, Allow must win on
#: equal length), and an ignored unknown directive
_ROBOTS_TXT = """\
# synthetic politeness file
User-agent: *
Disallow: /

User-agent: graftbot
User-agent: otherbot
Allow: /doc/
Disallow: /doc/*1/p$
Disallow: /admin/
Disallow: /tie/*
Allow: /tie/a
Crawl-delay: 5
"""

_ROBOTS_ORACLE = (
    "WITH d AS (SELECT doc_id, doc_id % 4 AS m FROM documents) "
    "SELECT doc_id, "
    "CASE m WHEN 0 THEN '/doc/' || doc_id || '/p' "
    "WHEN 1 THEN '/admin/' || doc_id "
    "WHEN 2 THEN '/tie/a' || doc_id "
    "ELSE '/pub' || doc_id END AS path, "
    "CASE m WHEN 0 THEN doc_id % 10 <> 1 "
    "WHEN 1 THEN FALSE ELSE TRUE END AS allowed, "
    "CASE m WHEN 0 THEN (CASE WHEN doc_id % 10 = 1 "
    "THEN '/doc/*1/p$' ELSE '/doc/' END) "
    "WHEN 1 THEN '/admin/' WHEN 2 THEN '/tie/a' "
    "ELSE NULL END AS matched_rule, "
    "CAST(CASE m WHEN 0 THEN (CASE WHEN doc_id % 10 = 1 "
    "THEN 10 ELSE 5 END) "
    "WHEN 1 THEN 7 WHEN 2 THEN 6 ELSE 0 END AS INT) AS rule_len "
    "FROM d"
)


@query("corpus_robots_gate", oracle=_ROBOTS_ORACLE)
def corpus_robots_gate(spark, sf_dir):
    """REAL robots.txt evaluation (RFC 9309) — stage -1 of every
    crawl, the politeness gate a fetcher consults before touching a
    URL: each doc gets one of four path shapes and the genuine parser
    + matcher decide it against a synthesized robots.txt whose
    structure concentrates every spec subtlety — GROUP SELECTION (a
    deny-all '*' group sits first, so picking the wrong group flips
    every verdict; the specific group names two agents), a wildcard +
    end-anchor pattern ('/doc/*1/p$', where a greedy first-occurrence
    matcher instead of backtracking is a real bug this repo fixed in
    review), LONGEST-MATCH precedence over rule order, an
    order-adversarial TIE that Allow must win on equal pattern length,
    comments, and an unknown directive that must be ignored. The
    DuckDB oracle predicts every verdict, matched pattern, and match
    length closed-form from doc_id arithmetic (disallowed iff the id's
    last digit makes the anchored wildcard land), so any matcher or
    group-selection defect fails the driver hash. One Arrow-batched
    stage; zero shuffle."""
    d = T.docs(spark, sf_dir).selectExpr(
        "doc_id",
        "CASE doc_id % 4 "
        "WHEN 0 THEN '/doc/' || CAST(doc_id AS STRING) || '/p' "
        "WHEN 1 THEN '/admin/' || CAST(doc_id AS STRING) "
        "WHEN 2 THEN '/tie/a' || CAST(doc_id AS STRING) "
        "ELSE '/pub' || CAST(doc_id AS STRING) END AS path",
    )
    return W.robots_eval(d, _ROBOTS_TXT, "graftbot")


# --- WET: the crawl pipeline's output format, written then re-parsed ---------

def _wet_oracle() -> str:
    return (
        "SELECT doc_id, CAST(2 AS INT) AS n_records, "
        "'conversion' AS warc_type, "
        "CAST(24 + octet_length(encode(text)) AS BIGINT) "
        "AS content_length, "
        "'https://crawl.example/doc/' || CAST(doc_id AS VARCHAR) "
        "AS target_uri, "
        "'Q&A <notes> ' || text || ' $end of doc' AS body_text "
        "FROM documents WHERE length(text) >= 1"
    )


@query("corpus_wet_roundtrip", oracle=_wet_oracle())
def corpus_wet_roundtrip(spark, sf_dir):
    """The crawl pipeline's WRITE side, closed end to end — Common
    Crawl publishes extracted text as WET files (the 'conversion'
    record profile of ISO 28500), and every corpus build that starts
    from WET trusts exactly this writer/parser pair: each doc's
    trap-laden HTML page (the corpus_html_extract synthesis) is
    text-extracted by the REAL extractor, written as a REAL WET stream
    (warcinfo + a conversion record: WARC-Target-URI, text/plain,
    Content-Length in UTF-8 bytes), and re-parsed by the REAL WARC
    walker — whose conversion branch treats the record block AS the
    text, per the WET profile — all in ONE Arrow-batched stage that
    fails loudly if the round-tripped text differs from the
    extraction. The DuckDB oracle predicts every field closed-form
    from the original row (body_text by string concatenation, the
    record's Content-Length as 24 + the text's byte length), so a
    defect in the extractor, the WET framing, or the record walk
    changes a value and fails the driver hash. Payloads are
    synthesized, written, and re-parsed in-row — ZERO shuffle; at
    crawl scale this is the same map-only shape as the WET-writing
    stage of a production crawl."""
    d = (
        T.docs(spark, sf_dir)
        .filter(F.length("text") >= 1)
        .select("doc_id", _html_col().alias("html"))
    )
    return W.wet_roundtrip(d)


# --- hyperlink graph: href extraction + degrees ------------------------------

#: the closed-form edge set both engines derive: each page links to
#: three targets — a QUADRATIC map (non-bijective, so in-degree varies
#: 0..several), a HUB map concentrating links on the first ~n/10 pages
#: (the power-law head every real web graph has), and the next page (a
#: ring for connectivity) — duplicate targets collapsed, self-loops
#: dropped, and every 17th page links only to itself (-> DANGLING, so
#: the dangling-mass term is load-bearing). n is the corpus size, so
#: the graph is defined for ANY scale factor / fuzz variant.
_T1 = "(doc_id * doc_id + 3) % {n}"
_T2 = "doc_id % ({n} {d} 10 + 1)"  # {d}: engine floor-div (// vs div)
_T3 = "(doc_id + 1) % {n}"


def _tgt(formula: str, n: str, d: str) -> str:
    # dangling pages resolve every target to themselves (dropped as
    # self-loops downstream)
    return (
        "CASE WHEN doc_id % 17 = 0 THEN doc_id ELSE "
        + formula.format(n=n, d=d)
        + " END"
    )


_EDGE_RAW_DUCK = (
    "raw AS ("
    f"SELECT doc_id AS src, {_tgt(_T1, 'nn.n', '//')} AS dst "
    "FROM documents, nn "
    f"UNION ALL SELECT doc_id, {_tgt(_T2, 'nn.n', '//')} "
    "FROM documents, nn "
    f"UNION ALL SELECT doc_id, {_tgt(_T3, 'nn.n', '//')} "
    "FROM documents, nn), "
    "edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)"
)

_LINK_GRAPH_ORACLE = (
    "WITH nn AS (SELECT COUNT(*) AS n FROM documents), "
    + _EDGE_RAW_DUCK + ", "
    "outd AS (SELECT src, COUNT(*) AS o FROM edges GROUP BY src), "
    "ind AS (SELECT dst, COUNT(*) AS i FROM edges GROUP BY dst) "
    "SELECT d.doc_id, CAST(4 AS INT) AS n_anchors, "
    "CAST(3 AS INT) AS n_hrefs, "
    "CAST(COALESCE(outd.o, 0) AS INT) AS out_degree, "
    "CAST(COALESCE(ind.i, 0) AS INT) AS in_degree "
    "FROM documents d "
    "LEFT JOIN outd ON outd.src = d.doc_id "
    "LEFT JOIN ind ON ind.dst = d.doc_id"
)

#: anchor page: three real links (one behind a quoted-'>' attribute
#: trap, one carrying a fragment the target parse must drop) plus a
#: script-string anchor, a commented-out anchor, and an href-less <a>
#: — the decoys the extractor must refuse (or count without emitting)
def _link_page_sql() -> str:
    t1 = _tgt(_T1, "n_docs", "div")
    t2 = _tgt(_T2, "n_docs", "div")
    t3 = _tgt(_T3, "n_docs", "div")
    return (
        "'<html><body> <p>stub</p> "
        f"<a href=\"/doc/' || CAST({t1} AS STRING) || "
        "'\">one</a> "
        "<script>var s = \"<a href=''/doc/999999''>trap</a>\";"
        "</script> "
        f"<a title=\"x>y\" href=\"/doc/' || CAST({t2} AS STRING) || "
        "'\">two</a> "
        "<!-- <a href=\"/doc/888888\">ghost</a> --> "
        f"<a href=\"/doc/' || CAST({t3} AS STRING) || "
        "'#frag\">three</a> "
        "<a name=\"no-href\">four</a> </body></html>'"
    )


def _doc_edges(spark, sf_dir):
    """The extracted edge list (src, dst) plus the per-doc anchor
    stats frame, built by the REAL href extractor over the synthesized
    anchor pages. The kernel output and the deduplicated edge list are
    each pinned ONCE — the stats row, the out-degree branch, and the
    in-degree branch all consume them, and an unpinned plan re-runs
    the Arrow extraction stage per branch (caught by
    test_link_graph_single_arrow_stage: 6 MapInPandas in the plan)."""
    d = T.docs(spark, sf_dir)
    nrow = d.agg(F.count("*").cast("long").alias("n_docs"))
    page = (
        d.select("doc_id")
        .crossJoin(F.broadcast(nrow))
        .selectExpr("doc_id", _link_page_sql() + " AS html")
    )
    lk = T.materialize(
        W.extract_links(page).select(
            "doc_id",
            "n_anchors",
            F.size("hrefs").cast("int").alias("n_hrefs"),
            "hrefs",
        )
    )
    edges = T.materialize(
        lk.select(
            F.col("doc_id").alias("src"),
            F.explode("hrefs").alias("href"),
        )
        .select(
            "src",
            F.regexp_extract("href", "^/doc/([0-9]+)", 1)
            .cast("long")
            .alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return lk.drop("hrefs"), edges


@query("corpus_link_graph", oracle=_LINK_GRAPH_ORACLE)
def corpus_link_graph(spark, sf_dir):
    """REAL hyperlink extraction -> link graph — the stage between a
    crawl's HTML fetch and its frontier/ranking logic (every production
    crawler builds exactly this edge list; C4/RefinedWeb-class corpora
    inherit their URL frontiers from it): each doc becomes an anchor
    page whose three real links are closed-form functions of doc_id,
    wrapped in the classic extractor traps — an anchor spelled inside a
    <script> string, an anchor inside an HTML comment, a quoted
    attribute value containing '>' BEFORE the href it must not eat, a
    fragment the target parse must drop, and an href-less <a> that
    counts as an anchor but emits no link. The REAL quote-aware tag
    walk (operators/webtext.py extract_hrefs) collects hrefs in one
    Arrow-batched mapInPandas stage; targets are parsed JVM-side,
    deduplicated, self-loops dropped, and both degree directions
    aggregated. The DuckDB oracle predicts the whole graph from doc_id
    arithmetic without parsing a byte, so a leaked trap anchor, a
    dropped real one, or an off-by-one in the attribute scan changes a
    degree and fails the driver hash. Scale: page synthesis and
    extraction are in-row (zero payload shuffle); the only shuffles are
    the edge distinct + two degree aggregations, all keyed by doc id —
    at 100 TB this is the same map-heavy profile as a production
    link-graph build, with the 1-row corpus count broadcast."""
    stats, edges = _doc_edges(spark, sf_dir)
    outd = edges.groupBy("src").agg(
        F.count("*").cast("int").alias("out_degree")
    )
    ind = edges.groupBy("dst").agg(
        F.count("*").cast("int").alias("in_degree")
    )
    return (
        stats.join(outd, stats.doc_id == outd.src, "left")
        .join(ind, stats.doc_id == ind.dst, "left")
        .select(
            "doc_id",
            "n_anchors",
            "n_hrefs",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


# --- PageRank over the link graph --------------------------------------------

#: fixed-point PageRank constants: ranks live in integer units of
#: 1e-12 (U), damping 85/100 — every operation is BIGINT arithmetic
#: (floor division of nonnegative values), so the 8-iteration fixpoint
#: is bit-identical across engines, partition layouts, and dialects.
_PR_U = 10**12
_PR_ITERS = 8


def _pagerank_oracle() -> str:
    # the loop-carried CTEs are MATERIALIZED: DuckDB inlines plain
    # CTEs, and each iteration references the previous rank frame
    # three times (contributions, dangling mass, carrier) — inlined,
    # the expansion is 3^8 copies of the whole chain, which exhausted
    # the file-handle limit on the documents scan before it exhausted
    # the time budget (found by the round-9 sf0.001 gate)
    u, d_num, d_den = _PR_U, 85, 100
    parts = [
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents)",
        _EDGE_RAW_DUCK.replace(
            "edges AS (", "edges AS MATERIALIZED (", 1
        ),
        "outd AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src)",
        "ind AS (SELECT dst, COUNT(*) AS ind FROM edges GROUP BY dst)",
        "nodes AS (SELECT d.doc_id AS v, COALESCE(outd.od, 0) AS od "
        "FROM documents d LEFT JOIN outd ON outd.src = d.doc_id)",
        f"r0 AS MATERIALIZED (SELECT v, od, "
        f"(SELECT {u} // n FROM nn) AS r FROM nodes)",
    ]
    for k in range(1, _PR_ITERS + 1):
        p = k - 1
        parts.append(
            f"c{k} AS (SELECT e.dst AS v, "
            f"SUM(({d_num} * p.r) // ({d_den} * p.od)) AS c "
            f"FROM edges e JOIN r{p} p ON p.v = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"g{k} AS (SELECT COALESCE(SUM(r), 0) AS dang "
            f"FROM r{p} WHERE od = 0)"
        )
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT p.v, p.od, "
            f"(SELECT (15 * {u}) // ({d_den} * n) FROM nn) + "
            f"(SELECT ({d_num} * g{k}.dang) // "
            f"({d_den} * (SELECT n FROM nn)) FROM g{k}) + "
            f"COALESCE(c{k}.c, 0) AS r "
            f"FROM r{p} p LEFT JOIN c{k} ON c{k}.v = p.v)"
        )
    return (
        "WITH " + ", ".join(parts) + " "
        f"SELECT r.v AS doc_id, CAST(r.r AS BIGINT) AS rank_units, "
        "CAST(r.od AS INT) AS out_degree, "
        "CAST(COALESCE(ind.ind, 0) AS INT) AS in_degree, "
        "r.od = 0 AS is_dangling "
        f"FROM r{_PR_ITERS} r LEFT JOIN ind ON ind.dst = r.v"
    )


@query("corpus_pagerank", oracle=_pagerank_oracle())
def corpus_pagerank(spark, sf_dir):
    """Fixed-point PageRank (Page et al. 1999) over the link graph —
    the crawl-frontier prioritization and document-authority signal
    every web-scale corpus pipeline computes (Common Crawl publishes
    exactly this as its host/domain rank files): 8 damped iterations
    with dangling-mass redistribution, on the same closed-form edge
    set corpus_link_graph gates the extractor against. Ranks live in
    integer units of 1e-12 with 85/100 damping so every step is BIGINT
    floor division — the fixpoint is bit-identical across engines,
    partition layouts, and dialects (no cross-row float sums; the
    round-5 determinism doctrine applied to an iterative algorithm).
    The DuckDB oracle unrolls the identical 8 iterations as chained
    CTEs. Spark shape — and the deliberate contrast with
    graph_pagerank_brands (advanced.py), whose node set is
    DIMENSION-sized and rides a broadcast join: here the node set is
    the CORPUS, so the rank vector can never broadcast; each iteration
    is a shuffle join of ranks onto edges by src plus ONE groupBy(dst)
    shuffle over contributions, with the 1-row dangling-mass total
    broadcast, and the rank frame's lineage cut per round so the plan
    stays iteration-constant — the canonical
    Pregel-without-a-graph-library shape at web scale, linear per
    iteration, AQE skew-splittable at the power-law head the hub map
    synthesizes. The fixture graph exercises every term: quadratic map
    (varied in-degree), hub map (skew), ring (connectivity), and
    every-17th-page dangling (mass redistribution). ref: the reference
    has no graph surface (NiFi_Flow.json:1 ingests a point API); this
    extends the crawl-loop family."""
    ranks, edges, _iters = _pagerank_state(spark, sf_dir)
    ind = edges.groupBy("dst").agg(
        F.count("*").cast("int").alias("in_degree")
    )
    return (
        ranks.join(ind, ranks.v == ind.dst, "left")
        .select(
            F.col("v").alias("doc_id"),
            F.col("r").cast("long").alias("rank_units"),
            F.col("od").cast("int").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            (F.col("od") == 0).alias("is_dangling"),
        )
    )


def _pagerank_state(spark, sf_dir):
    """The 8-iteration integer PageRank loop. Returns (ranks, edges,
    iters): the final rank frame, the pinned edge list, and one 1-row
    frame per iteration carrying (iteration, l1_delta_units,
    dangling_in_units) — shared by corpus_pagerank (fixpoint output)
    and corpus_pagerank_convergence (trajectory output). The 1-row
    corpus count and per-iteration dangling-mass totals ride broadcast
    crossJoins (allowlisted)."""
    d = T.docs(spark, sf_dir)
    nrow = d.agg(F.count("*").cast("long").alias("n_docs"))
    base = d.select("doc_id").crossJoin(F.broadcast(nrow))
    raw = (
        base.selectExpr(
            "doc_id AS src",
            _tgt(_T1, "n_docs", "div") + " AS dst",
        )
        .union(base.selectExpr("doc_id", _tgt(_T2, "n_docs", "div")))
        .union(base.selectExpr("doc_id", _tgt(_T3, "n_docs", "div")))
    )
    edges = T.materialize(
        raw.filter(F.col("src") != F.col("dst")).distinct(),
        cut_lineage=True,
    )
    outd = edges.groupBy("src").agg(F.count("*").alias("od"))
    nodes = T.materialize(
        base.join(outd, base.doc_id == outd.src, "left")
        .select(
            F.col("doc_id").alias("v"),
            F.coalesce("od", F.lit(0).cast("long")).alias("od"),
            "n_docs",
        ),
        cut_lineage=True,
    )
    u, d_num, d_den = _PR_U, 85, 100
    ranks = nodes.select(
        "v", "od", "n_docs",
        F.expr(f"CAST({u} AS BIGINT) div n_docs").alias("r"),
    )
    iters = []
    for k in range(1, _PR_ITERS + 1):
        contrib = (
            edges.join(
                ranks.select(F.col("v").alias("src"), "od", "r"),
                "src",
            )
            .groupBy("dst")
            .agg(
                F.sum(
                    F.expr(f"({d_num} * r) div ({d_den} * od)")
                ).alias("c")
            )
        )
        dang = ranks.filter(F.col("od") == 0).agg(
            F.coalesce(F.sum("r"), F.lit(0).cast("long")).alias(
                "dang"
            )
        )
        prev = ranks
        ranks = T.materialize(
            ranks.drop("r")
            .join(contrib, ranks.v == contrib.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "v", "od", "n_docs",
                F.expr(
                    f"(15 * CAST({u} AS BIGINT)) div "
                    f"({d_den} * n_docs) + "
                    f"({d_num} * dang) div ({d_den} * n_docs) + "
                    "COALESCE(c, CAST(0 AS BIGINT))"
                ).alias("r"),
            ),
            cut_lineage=True,  # loop state: plan must not grow per round
        )
        iters.append(
            ranks.select("v", F.col("r").alias("rn"))
            .join(prev.select("v", F.col("r").alias("rp")), "v")
            .agg(
                F.sum(F.abs(F.col("rn") - F.col("rp")))
                .cast("long")
                .alias("l1_delta_units")
            )
            .crossJoin(F.broadcast(dang))
            .select(
                F.lit(k).cast("int").alias("iteration"),
                "l1_delta_units",
                F.col("dang").cast("long").alias("dangling_in_units"),
            )
        )
    return ranks, edges, iters


def _pagerank_convergence_oracle() -> str:
    rows = []
    for k in range(1, _PR_ITERS + 1):
        rows.append(
            f"SELECT CAST({k} AS INT) AS iteration, "
            f"(SELECT CAST(SUM(ABS(a.r - b.r)) AS BIGINT) "
            f"FROM r{k} a JOIN r{k - 1} b ON b.v = a.v) "
            "AS l1_delta_units, "
            f"(SELECT CAST(dang AS BIGINT) FROM g{k}) "
            "AS dangling_in_units"
        )
    # reuse the fixpoint oracle's CTE chain, swap the final SELECT
    base = _pagerank_oracle()
    head = base[: base.rindex(" SELECT r.v AS doc_id")]
    return head + " " + " UNION ALL ".join(rows)


@query(
    "corpus_pagerank_convergence", oracle=_pagerank_convergence_oracle()
)
def corpus_pagerank_convergence(spark, sf_dir):
    """The PageRank iteration TRAJECTORY, gated — per-iteration L1
    movement (in 1e-12 rank units) and the dangling mass entering each
    round. The fixpoint gate (corpus_pagerank) can be passed by a
    wrong-but-converged implementation only by accident; matching all
    eight (delta, dangling) pairs pins every intermediate state, the
    convergence-monitoring signal a production run actually watches to
    pick its stopping point. Same integer loop (shared
    _pagerank_state), same bit-identical arithmetic; each delta is one
    node-sized self-join aggregated to 1 row, unioned across rounds.
    The DuckDB twin reuses the fixpoint oracle's materialized CTE
    chain with a trajectory final instead."""
    _ranks, _edges, iters = _pagerank_state(spark, sf_dir)
    out = iters[0]
    for f in iters[1:]:
        out = out.unionByName(f)
    return out


# --- sitemap XML: crawl discovery ------------------------------------------

#: XML prolog + a comment trap carrying a fake <url> entry the parser
#: must not count
_SM_PRE = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    "<!-- trap <url><loc>http://no</loc></url> -->"
)
_SM_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"

#: regular <url> entries: loc with a named (&amp;) entity everywhere
#: and a numeric (&#47;) one on entry 1, lastmod/changefreq/priority
#: all closed-form in (doc_id, i); entry 1's priority is whitespace-
#: padded (the spec-trim trap). Residues are pmod-normalized (signed
#: doc_id doctrine).
_SM_URLS = (
    "concat_ws('', transform(sequence(1, pmod(doc_id, 3) + 1), "
    "i -> concat("
    "'<url><loc>http://ex.com/d/', CAST(doc_id AS STRING), "
    "'/p', CAST(i AS STRING), '?a=1&amp;b=2', "
    "CASE WHEN i = 1 THEN '&#47;x' ELSE '' END, "
    "'</loc><lastmod>2026-0', "
    "CAST(pmod(doc_id + i, 9) + 1 AS STRING), '-1', "
    "CAST(i AS STRING), "
    "'</lastmod><changefreq>', "
    "CASE pmod(doc_id + i, 3) WHEN 0 THEN 'daily' "
    "WHEN 1 THEN 'weekly' ELSE 'monthly' END, "
    "'</changefreq><priority>', "
    "CASE WHEN i = 1 THEN concat(' 0.', "
    "CAST(pmod(doc_id + 3 * i, 10) AS STRING), ' ') "
    "ELSE concat('0.', CAST(pmod(doc_id + 3 * i, 10) AS STRING)) END, "
    "'</priority></url>')))"
)

#: nested <sitemap> entries for the index pages
_SM_NESTED = (
    "concat_ws('', transform(sequence(1, pmod(doc_id, 2) + 2), "
    "j -> concat("
    "'<sitemap><loc>http://ex.com/sm/', CAST(doc_id AS STRING), "
    "'/', CAST(j AS STRING), '.xml</loc>"
    "<lastmod>2026-03-0', CAST(j AS STRING), "
    "'</lastmod></sitemap>')))"
)


def _sitemap_col():
    """The synthesized sitemap as a Column: every 5th doc is a
    <sitemapindex> (the two-level protocol), the rest are <urlset>
    pages carrying the parser traps — comment with a fake entry, a
    quoted attribute value containing '>', a CDATA loc whose '&amp;'
    must stay VERBATIM (5 chars, not decoded), entity-decoded locs,
    padded priority, and a self-closing namespaced foreign element."""
    return F.expr(
        "CASE WHEN pmod(doc_id, 5) = 0 THEN concat("
        f"'{_SM_PRE}<sitemapindex xmlns=\"{_SM_NS}\">', {_SM_NESTED}, "
        "'</sitemapindex>') "
        "ELSE concat("
        f"'{_SM_PRE}<urlset xmlns=\"{_SM_NS}\" data-note=\"a>b\">', "
        f"{_SM_URLS}, "
        "'<url><loc><![CDATA[http://ex.com/cd/', "
        "CAST(doc_id AS STRING), '&amp;raw]]></loc></url>"
        "<x:meta/></urlset>') END"
    )


def _sitemap_oracle() -> str:
    """Closed-form prediction of every parsed field from doc_id
    arithmetic: decoded loc lengths ('http://ex.com/d/'=16 + id + '/p'
    + digit + '?a=1&b=2'=8 -> 27+idl, +2 for entry 1's '&#47;x'->'/x';
    CDATA loc stays VERBATIM at 25+idl including the undecoded
    '&amp;'; nested locs 23+idl), exact milli-priorities, daily
    counts, and the lexicographic max lastmod — enumerated per entry
    with a range cross join, never parsing a byte. b is referenced
    twice -> AS MATERIALIZED."""
    return (
        "WITH b AS MATERIALIZED (SELECT doc_id, "
        "len(CAST(doc_id AS VARCHAR)) AS idl, "
        "((doc_id % 5) + 5) % 5 = 0 AS isx, "
        "((doc_id % 3) + 3) % 3 + 1 AS k, "
        "((doc_id % 2) + 2) % 2 + 2 AS j "
        "FROM documents), "
        "u AS (SELECT b.doc_id, "
        "27 + b.idl + CASE WHEN r.range = 1 THEN 2 ELSE 0 END AS ll, "
        "((((b.doc_id + 3 * r.range) % 10) + 10) % 10) * 100 AS pm, "
        "CASE WHEN (((b.doc_id + r.range) % 3) + 3) % 3 = 0 "
        "THEN 1 ELSE 0 END AS dly, "
        "'2026-0' || CAST((((b.doc_id + r.range) % 9) + 9) % 9 + 1 "
        "AS VARCHAR) || '-1' || CAST(r.range AS VARCHAR) AS lm "
        "FROM b, range(1, 4) r WHERE NOT b.isx AND r.range <= b.k), "
        "ua AS (SELECT doc_id, SUM(ll) AS sll, SUM(pm) AS spm, "
        "SUM(dly) AS nd, MAX(lm) AS ml FROM u GROUP BY doc_id) "
        "SELECT b.doc_id, "
        "CASE WHEN b.isx THEN 'sitemapindex' ELSE 'urlset' END AS kind, "
        "CAST(CASE WHEN b.isx THEN 0 ELSE b.k + 1 END AS INT) "
        "AS n_urls, "
        "CAST(CASE WHEN b.isx THEN b.j ELSE 0 END AS INT) AS n_nested, "
        "CAST(CASE WHEN b.isx THEN b.j * (23 + b.idl) "
        "ELSE ua.sll + 25 + b.idl END AS BIGINT) AS locs_len, "
        "CAST(CASE WHEN b.isx THEN 0 ELSE ua.spm END AS BIGINT) "
        "AS pr_sum_milli, "
        "CAST(CASE WHEN b.isx THEN 0 ELSE ua.nd END AS INT) "
        "AS n_daily, "
        "CASE WHEN b.isx THEN '2026-03-0' || CAST(b.j AS VARCHAR) "
        "ELSE ua.ml END AS max_lastmod "
        "FROM b LEFT JOIN ua USING (doc_id)"
    )


@query("corpus_sitemap_xml", oracle=_sitemap_oracle())
def corpus_sitemap_xml(spark, sf_dir):
    """REAL sitemap-protocol XML parsing (sitemaps.org) — crawl
    DISCOVERY, the stage before robots/fetch that tells a crawler
    WHAT to fetch; with corpus_robots_gate (may I?), the link graph
    (what points where) and the WARC walk (what came back), this
    completes the crawl front door both directions. Every 5th doc is
    a two-level <sitemapindex>; the rest are <urlset> pages whose
    synthesized markup concentrates the XML-parser traps: a comment
    carrying a fake <url> entry, a quoted attribute value containing
    '>', a CDATA loc whose '&amp;' must stay verbatim (CDATA is never
    entity-decoded — the classic leak), named AND numeric entities in
    ordinary locs, a whitespace-padded <priority> that must trim, and
    a self-closing namespaced foreign element. The genuine quote-aware
    state machine (operators/webtext.py parse_sitemap) runs in one
    Arrow-batched mapInPandas stage; the DuckDB oracle predicts every
    output field closed-form from doc_id arithmetic — decoded-loc
    length sums, exact milli-priorities, daily-changefreq counts, max
    lastmod — so any parser defect (counting the comment's fake entry,
    decoding inside CDATA, truncating at the attribute '>', skipping
    the trim) fails the driver hash. Scale: sitemap synthesis and
    parsing are in-row over a spread scan, ZERO shuffle; at 100 TB
    this is the same map-only profile as a production frontier build."""
    d = T.spread_small_scan(
        T.docs(spark, sf_dir), spark, f"{sf_dir}/documents.parquet"
    ).select("doc_id", _sitemap_col().alias("xml"))
    return W.sitemap_stats(d)


# --- link-graph connected components (pointer jumping) ----------------------

#: pointer-jumping rounds: label reach doubles per round (2^8 = 256
#: covers the hub-mixed graph's diameter with a wide margin at every
#: test scale; convergence is separately PROVEN against a union-find
#: reference in tests/test_webtext.py). Both engines run exactly R
#: rounds of the identical recurrence, so the gate is bit-identical
#: labels whether or not a pathological graph would need more.
_LC_R = 8


def _lc_oracle() -> str:
    parts = [
        "nn AS (SELECT COUNT(*) AS n FROM documents)",
        _EDGE_RAW_DUCK,  # raw + edges (the closed-form link graph)
        "und AS (SELECT src AS a, dst AS b FROM edges "
        "UNION SELECT dst, src FROM edges)",
        "l0 AS (SELECT doc_id AS doc, doc_id AS lab FROM documents)",
    ]
    for k in range(1, _LC_R + 1):
        p = k - 1
        parts.append(
            f"l{k} AS (SELECT s.doc, "
            "LEAST(s.lab, p.lab, COALESCE(m.ml, s.lab)) AS lab "
            f"FROM l{p} s JOIN l{p} p ON p.doc = s.lab "
            "LEFT JOIN (SELECT e.a AS doc, MIN(l.lab) AS ml "
            f"FROM und e JOIN l{p} l ON l.doc = e.b GROUP BY e.a) m "
            "ON m.doc = s.doc)"
        )
    last = f"l{_LC_R}"
    parts.append(
        f"sz AS (SELECT lab, COUNT(*) AS c FROM {last} GROUP BY lab)"
    )
    from ..queries.similarity import _mat_ctes

    return _mat_ctes(
        "WITH " + ", ".join(parts) + " "
        "SELECT doc AS doc_id, CAST(lab AS BIGINT) AS component, "
        f"CAST(c AS BIGINT) AS comp_size FROM {last} JOIN sz USING (lab)",
        ("und", last) + tuple(f"l{k}" for k in range(_LC_R)),
    )


@query("corpus_link_components", oracle=_lc_oracle())
def corpus_link_components(spark, sf_dir):
    """Connected components over the REAL extracted hyperlink graph by
    POINTER JUMPING — the host/domain-grouping pass a web corpus runs
    on its link graph (site-level dedup, spam-farm detection, crawl
    sharding all start from 'which pages form one site-component').
    The near-dup CC operator (dedup_clusters) deliberately uses plain
    min-label propagation because its components are near-cliques;
    THIS graph is the opposite regime — the synthesized pages chain
    into long ring segments merged through hubs — and pointer jumping
    (each round also adopts the label OF the current label, squaring
    propagation distance) is the algorithm that makes long chains
    converge in O(log diameter) rounds instead of O(diameter). Both
    engines run exactly R=8 rounds of the identical monotone
    recurrence lab <- min(lab, lab[lab], min over neighbors), so every
    intermediate state is pinned bit-identically; actual convergence
    (and the O(log) vs O(linear) claim) is proven against a Python
    union-find reference on the same extracted edges in the unit
    battery. Emits each page's component label (the component's min
    doc_id) and component size.

    Scale shape: edge extraction is the link-graph query's single
    Arrow stage; each round is two id-keyed joins plus one edge-keyed
    neighbor-min agg — all linear, all spillable, lineage cut per
    round so the plan stays flat. At 100 TB this is the textbook
    large-graph CC shape (hash-to-min family) with the log-round
    guarantee long chains need."""
    _lk, edges = _doc_edges(spark, sf_dir)
    und = T.materialize(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(
            edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
        )
        .distinct(),
        cut_lineage=True,
    )
    labels = T.docs(spark, sf_dir).select(
        F.col("doc_id").alias("doc"), F.col("doc_id").alias("lab")
    )
    for _k in range(_LC_R):
        nbr = (
            und.join(labels, und.b == labels.doc)
            .groupBy("a")
            .agg(F.min("lab").alias("ml"))
        )
        ptr = labels.select(
            F.col("doc").alias("pdoc"), F.col("lab").alias("plab")
        )
        labels = T.materialize(
            labels.join(ptr, labels.lab == ptr.pdoc)
            .join(nbr, labels.doc == nbr.a, "left")
            .select(
                "doc",
                F.expr(
                    "least(lab, plab, coalesce(ml, lab))"
                ).alias("lab"),
            ),
            cut_lineage=True,
        )
    sizes = labels.groupBy("lab").agg(
        F.count(F.lit(1)).cast("bigint").alias("comp_size")
    )
    return labels.join(sizes, "lab").select(
        F.col("doc").alias("doc_id"),
        F.col("lab").cast("bigint").alias("component"),
        "comp_size",
    )


# --- triangle counting on the link graph (degree-ordered orientation) --------

def _tri_oracle() -> str:
    """Same relational chain as the Spark side, DuckDB dialect: the
    multi-referenced und/deg/oriented CTEs are MATERIALIZED (the
    round-9 inlining doctrine — und feeds deg and oriented, oriented
    feeds the wedge self-join TWICE plus the closing-edge probe)."""
    return (
        "WITH nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents), "
        + _EDGE_RAW_DUCK.replace("edges AS (", "edges AS MATERIALIZED (", 1)
        + ", "
        "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, "
        "greatest(src, dst) AS v FROM edges), "
        "deg AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM ("
        "SELECT u AS node FROM und UNION ALL SELECT v FROM und) "
        "GROUP BY node), "
        "oriented AS MATERIALIZED (SELECT "
        "CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v) "
        "THEN und.u ELSE und.v END AS a, "
        "CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v) "
        "THEN und.v ELSE und.u END AS b, "
        "CASE WHEN du.d < dv.d OR (du.d = dv.d AND und.u < und.v) "
        "THEN dv.d ELSE du.d END AS db "
        "FROM und JOIN deg du ON du.node = und.u "
        "JOIN deg dv ON dv.node = und.v), "
        "tri AS (SELECT COUNT(*) AS t FROM ("
        "SELECT o1.a, "
        "CASE WHEN o1.db < o2.db OR (o1.db = o2.db AND o1.b < o2.b) "
        "THEN o1.b ELSE o2.b END AS lo, "
        "CASE WHEN o1.db < o2.db OR (o1.db = o2.db AND o1.b < o2.b) "
        "THEN o2.b ELSE o1.b END AS hi "
        "FROM oriented o1 JOIN oriented o2 "
        "ON o1.a = o2.a AND o1.b < o2.b) w "
        "JOIN oriented e ON e.a = w.lo AND e.b = w.hi), "
        "agg AS (SELECT COUNT(*) AS n_nodes, "
        "SUM(d * (d - 1) // 2) AS wedges FROM deg), "
        "eo AS (SELECT SUM(c) AS n_edges, "
        "MAX(c) AS max_oriented_outdeg FROM ("
        "SELECT a, COUNT(*) AS c FROM oriented GROUP BY a)) "
        "SELECT CAST(agg.n_nodes AS BIGINT) AS n_nodes, "
        "CAST(eo.n_edges AS BIGINT) AS n_edges, "
        "CAST(agg.wedges AS BIGINT) AS n_wedges, "
        "CAST(tri.t AS BIGINT) AS n_triangles, "
        "CAST(eo.max_oriented_outdeg AS BIGINT) AS max_oriented_outdeg, "
        "CASE WHEN agg.wedges = 0 THEN 0 ELSE "
        "CAST(ROUND(3.0e0 * tri.t / agg.wedges * 1.0e6) AS BIGINT) END "
        "AS clustering_ppm "
        "FROM agg CROSS JOIN tri CROSS JOIN eo"
    )


@query("corpus_link_triangles", oracle=_tri_oracle())
def corpus_link_triangles(spark, sf_dir):
    """Triangle counting over the extracted hyperlink graph — the
    graph kernel behind spam-farm detection, community density, and
    clustering-coefficient features on real web graphs — via the
    DEGREE-ORDERED ORIENTATION algorithm (each undirected edge points
    from its (degree, id)-lower endpoint to the higher), the standard
    way this survives web scale: oriented out-degree is bounded by
    graph arboricity ~ sqrt(m), so the wedge self-join materializes
    Sum outdeg^2 rows instead of Sum deg^2 — hub nodes (this graph
    plants a power-law head by construction) contribute almost
    nothing because their edges orient INWARD. Wedge pairs are
    re-ordered by the same total order so the closing-edge probe is a
    pure EQUI-join (no OR-disjunction join). Edges come from the REAL
    href extractor over trap-laden anchor pages; the oracle recomputes
    the whole chain from doc_id arithmetic with the multi-referenced
    CTEs materialized. Output pins node/edge/wedge/triangle counts,
    the max oriented out-degree (the orientation property itself), and
    the global clustering coefficient in exact ppm units. Shuffles are
    all id-keyed equi-joins at edge cardinality."""
    _, edges = _doc_edges(spark, sf_dir)
    und = T.materialize(
        edges.selectExpr(
            "least(src, dst) AS u", "greatest(src, dst) AS v"
        ).distinct()
    )
    deg = T.materialize(
        und.selectExpr("u AS node")
        .unionAll(und.selectExpr("v AS node"))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.selectExpr("node AS u", "d AS du_d")
    dv = deg.selectExpr("node AS v", "d AS dv_d")
    lower = "du_d < dv_d OR (du_d = dv_d AND u < v)"
    oriented = T.materialize(
        und.join(du, "u")
        .join(dv, "v")
        .selectExpr(
            f"CASE WHEN {lower} THEN u ELSE v END AS a",
            f"CASE WHEN {lower} THEN v ELSE u END AS b",
            f"CASE WHEN {lower} THEN dv_d ELSE du_d END AS db",
        )
    )
    o1 = oriented.selectExpr("a", "b AS b1", "db AS db1")
    o2 = oriented.selectExpr("a", "b AS b2", "db AS db2")
    wlow = "db1 < db2 OR (db1 = db2 AND b1 < b2)"
    wedges_f = (
        o1.join(o2, "a")
        .filter(F.expr("b1 < b2"))
        .selectExpr(
            f"CASE WHEN {wlow} THEN b1 ELSE b2 END AS lo",
            f"CASE WHEN {wlow} THEN b2 ELSE b1 END AS hi",
        )
    )
    tri = wedges_f.join(
        oriented.selectExpr("a AS lo", "b AS hi"), ["lo", "hi"]
    ).agg(F.count("*").alias("t"))
    agg = deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("long").alias("wedges"),
    )
    eo = (
        oriented.groupBy("a")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.lit(0)).alias("_z"),
            F.max("c").cast("long").alias("max_oriented_outdeg"),
        )
        .crossJoin(und.agg(F.count("*").cast("long").alias("n_edges")))
        .select("n_edges", "max_oriented_outdeg")
    )
    return (
        agg.crossJoin(tri)
        .crossJoin(eo)
        .selectExpr(
            "n_nodes",
            "n_edges",
            "wedges AS n_wedges",
            "CAST(t AS BIGINT) AS n_triangles",
            "max_oriented_outdeg",
            "CASE WHEN wedges = 0 THEN 0 ELSE "
            "CAST(ROUND(3.0e0 * t / wedges * 1.0e6) AS BIGINT) END "
            "AS clustering_ppm",
        )
    )
