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
    rec0 = F.lit(
        "WARC/1.1" + crlf + "WARC-Type: warcinfo" + crlf
        + "Content-Length: " + str(len(_WARCINFO_BODY.encode())) + crlf
        + crlf + _WARCINFO_BODY + crlf + crlf
    )
    rec1 = F.concat(
        F.lit("WARC/1.1" + crlf + "WARC-Type: response" + crlf),
        F.lit("WARC-Target-URI: http://example.com/doc/"),
        F.col("doc_id").cast("string"),
        F.lit(crlf + "Content-Length: "),
        F.octet_length(http).cast("string"),
        F.lit(crlf + crlf),
        http,
        F.lit(crlf + crlf),
    )
    return F.encode(F.concat(rec0, rec1), "utf-8")


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
