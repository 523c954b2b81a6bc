"""Web-document kernels: REAL HTML text extraction and REAL WARC record
parsing — the two parsers every web-crawl curation pipeline runs before
any quality/dedup operator sees a byte of text.

Both follow the repo's real-kernel gating pattern (PPM/WAV/Y4M/JPEG/
PNG): the wire payload is SYNTHESIZED deterministically JVM-side (pure
SQL string/binary concat over the documents table), the genuine parser
runs in one Arrow-batched mapInPandas stage, and a DuckDB oracle
predicts every output by string/length arithmetic — so the parser's
state machine is hash-gated end to end without the oracle ever running
a parser.

ref: the reference has no web-ingest surface at all (its ingest is a
REST weather API, NiFi_Flow.json:1); this extends the north-star
LLM-data-pipeline family, where crawl HTML -> text and WARC -> records
are the first two stages of the standard corpus build.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as Ty

# --- HTML text extraction ---------------------------------------------------

#: named entities the extractor decodes; anything else passes through
#: verbatim (lenient — real crawl HTML is full of stray ampersands)
_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
}


def _decode_entities(s: str) -> str:
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c != "&":
            out.append(c)
            i += 1
            continue
        semi = s.find(";", i + 1, i + 10)
        if semi < 0:
            out.append(c)
            i += 1
            continue
        name = s[i + 1:semi]
        if name.startswith("#"):
            try:
                code = int(name[2:], 16) if name[1:2] in ("x", "X") else int(
                    name[1:]
                )
                out.append(chr(code))
                i = semi + 1
                continue
            except ValueError:
                pass
        elif name in _ENTITIES:
            out.append(_ENTITIES[name])
            i = semi + 1
            continue
        out.append(c)  # lenient: not a recognized entity
        i += 1
    return "".join(out)


def extract_html_text(html: str) -> tuple[str, int, int, int]:
    """REAL HTML text extraction (the trafilatura/jusText job, reduced
    to its load-bearing state machine): walk the markup once, keep only
    BODY text content, drop <script>/<style> subtrees wholesale (their
    content is code, not text — including markup-lookalike strings
    inside them), drop comments, survive the classic attribute trap
    ('>' inside a quoted attribute value must not close the tag),
    decode entities, and collapse whitespace runs to single spaces.
    Returns (text, n_tags, n_dropped_blocks, n_comments)."""
    out: list[str] = []
    i, n = 0, len(html)
    in_body = False
    skip_until: str | None = None  # inside <script>/<style>
    n_tags = n_blocks = n_comments = 0
    while i < n:
        c = html[i]
        if c == "<":
            if html.startswith("<!--", i):
                end = html.find("-->", i + 4)
                if end < 0:
                    raise ValueError("unterminated comment")
                n_comments += 1
                i = end + 3
                continue
            if html.startswith("<!", i):  # doctype etc.
                end = html.find(">", i)
                if end < 0:
                    raise ValueError("unterminated declaration")
                i = end + 1
                continue
            # scan the tag, honoring quoted attribute values
            j = i + 1
            quote: str | None = None
            while j < n:
                ch = html[j]
                if quote:
                    if ch == quote:
                        quote = None
                elif ch in ("'", '"'):
                    quote = ch
                elif ch == ">":
                    break
                j += 1
            if j >= n:
                raise ValueError("unterminated tag")
            tag_body = html[i + 1:j]
            i = j + 1
            closing = tag_body.startswith("/")
            name = (
                tag_body[1:] if closing else tag_body
            ).split(None, 1)[0].rstrip("/").lower()
            n_tags += 1
            if skip_until is not None:
                if closing and name == skip_until:
                    skip_until = None
                continue
            if not closing and name in ("script", "style"):
                skip_until = name
                n_blocks += 1
            elif name == "body":
                in_body = not closing
            continue
        if skip_until is None and in_body:
            out.append(c)
        i += 1
    text = " ".join(_decode_entities("".join(out)).split())
    return text, n_tags, n_blocks, n_comments


HTML_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("extracted", Ty.StringType()),
        Ty.StructField("n_tags", Ty.IntegerType()),
        Ty.StructField("n_dropped_blocks", Ty.IntegerType()),
        Ty.StructField("n_comments", Ty.IntegerType()),
    ]
)


def html_extract(df: DataFrame) -> DataFrame:
    """Arrow-batched distributed HTML text extraction over an `html`
    string column; one output row per document."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in HTML_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                text, tags, blocks, comments = extract_html_text(
                    html or ""
                )
                rows.append((int(doc_id), text, tags, blocks, comments))
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "html").mapInPandas(
        _batches, schema=HTML_SCHEMA
    )


# --- WARC record parsing ----------------------------------------------------

WARC_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("record_idx", Ty.IntegerType()),
        Ty.StructField("warc_type", Ty.StringType()),
        Ty.StructField("content_length", Ty.LongType()),
        Ty.StructField("http_status", Ty.IntegerType()),
        Ty.StructField("payload_len", Ty.LongType()),
        Ty.StructField("body_text", Ty.StringType()),
    ]
)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if not line:
            continue
        k, _, v = line.partition(b":")
        headers[k.decode("ascii").strip().lower()] = v.decode(
            "utf-8"
        ).strip()
    return headers


def _dechunk(data: bytes) -> bytes:
    """REAL HTTP/1.1 chunked transfer-decoding (RFC 9112 §7.1):
    hex-size line (chunk extensions after ';' ignored per spec), CRLF,
    exactly that many data bytes, CRLF; repeat until the 0-size last
    chunk, which must be followed by the final CRLF (empty trailer
    section). Fails loudly on a bad size line, truncation, a missing
    chunk-data CRLF, or trailing garbage after the terminator."""
    out = bytearray()
    pos, n = 0, len(data)
    while True:
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated chunk-size line")
        size_tok = data[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(
                f"bad chunk size line: {data[pos:eol][:20]!r}"
            ) from None
        pos = eol + 2
        if size == 0:
            # empty trailer section: the terminating CRLF, then EOS
            if data[pos:pos + 2] != b"\r\n":
                raise ValueError("missing chunked-body terminator")
            if pos + 2 != n:
                raise ValueError("garbage after chunked terminator")
            return bytes(out)
        chunk = data[pos:pos + size]
        if len(chunk) != size:
            raise ValueError("truncated chunk data")
        if data[pos + size:pos + size + 2] != b"\r\n":
            raise ValueError("missing CRLF after chunk data")
        out += chunk
        pos += size + 2


def parse_warc(payload: bytes):
    """REAL WARC (ISO 28500) record walk: per record, the version line,
    CRLF-terminated named headers up to the blank line, exactly
    Content-Length bytes of block, then the mandatory CRLF CRLF record
    separator; repeat until the stream ends. For response records the
    HTTP block is parsed too (status line, headers, body sliced by the
    HTTP Content-Length — or reassembled by the chunked
    transfer-decoder when the response declares Transfer-Encoding:
    chunked, as real crawl captures do). Yields (warc_type,
    content_length, http_status|None, payload_len|None,
    body_text|None). Fails loudly on a bad version line, missing
    Content-Length, or truncation."""
    pos, n = 0, len(payload)
    while pos < n:
        hdr_end = payload.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        head = payload[pos:hdr_end]
        ver, _, rest = head.partition(b"\r\n")
        if not ver.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {ver[:20]!r}")
        headers = _parse_headers(rest)
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        clen = int(headers["content-length"])
        block_start = hdr_end + 4
        block = payload[block_start:block_start + clen]
        if len(block) != clen:
            raise ValueError("truncated WARC record block")
        if payload[block_start + clen:block_start + clen + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record separator")
        wtype = headers.get("warc-type", "")
        status = plen = body = None
        if wtype == "conversion":
            # WET semantics (ISO 28500 + the Common Crawl WET profile):
            # a conversion record's block IS the extracted plain text
            plen = clen
            body = block.decode("utf-8")
        elif wtype == "response" and block.startswith(b"HTTP/"):
            http_hdr_end = block.find(b"\r\n\r\n")
            if http_hdr_end < 0:
                raise ValueError("truncated HTTP header block")
            status_line, _, hrest = block[:http_hdr_end].partition(
                b"\r\n"
            )
            status = int(status_line.split(b" ")[1])
            hh = _parse_headers(hrest)
            if hh.get("transfer-encoding", "").lower() == "chunked":
                body_bytes = _dechunk(block[http_hdr_end + 4:])
                plen = len(body_bytes)
            else:
                plen = int(hh.get("content-length", "0"))
                body_bytes = block[
                    http_hdr_end + 4:http_hdr_end + 4 + plen
                ]
                if len(body_bytes) != plen:
                    raise ValueError("truncated HTTP body")
            body = body_bytes.decode("utf-8")
        yield wtype, clen, status, plen, body
        pos = block_start + clen + 4


def warc_records(df: DataFrame) -> DataFrame:
    """Arrow-batched distributed WARC parsing over a binary `content`
    column; one output row per record in each document's stream."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                for idx, (wtype, clen, status, plen, body) in enumerate(
                    parse_warc(payload)
                ):
                    rows.append(
                        (int(doc_id), idx, wtype, clen, status, plen, body)
                    )
            out = pd.DataFrame(rows, columns=cols)
            out["http_status"] = out["http_status"].astype("Int64")
            out["payload_len"] = out["payload_len"].astype("Int64")
            yield out

    return df.select("doc_id", "content").mapInPandas(
        _batches, schema=WARC_SCHEMA
    )


# --- composed crawl front door: WARC -> HTML -> text stats -------------------

CRAWL_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("n_records", Ty.IntegerType()),
        Ty.StructField("content_length", Ty.LongType()),
        Ty.StructField("n_tags", Ty.IntegerType()),
        Ty.StructField("n_tokens", Ty.LongType()),
        Ty.StructField("n_chars", Ty.LongType()),
    ]
)


def crawl_extract_stats(df: DataFrame) -> DataFrame:
    """The composed crawl front door in ONE Arrow-batched stage: walk
    the WARC stream (real parser), take the response record's HTTP body
    — an HTML page — run the real extractor over it, and emit the
    token/char stats of the recovered text. This is the stage-0+1
    chain of a crawl-derived corpus build executed end to end; each
    payload is parsed and extracted exactly once and never shuffles."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in CRAWL_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                recs = list(parse_warc(payload))
                resp = next(r for r in recs if r[0] == "response")
                text, tags, _blocks, _comments = extract_html_text(
                    resp[4] or ""
                )
                rows.append(
                    (
                        int(doc_id),
                        len(recs),
                        resp[1],
                        tags,
                        len(text.split(" ")) if text else 0,
                        len(text),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "content").mapInPandas(
        _batches, schema=CRAWL_SCHEMA
    )


# --- gzip WARC members (.warc.gz, the Common Crawl wire format) --------------
#
# Common Crawl does not ship identity-encoded WARC: every record is its
# own RFC 1952 gzip member and the file is the concatenation of those
# members (so a reader can seek to any record and inflate just it).
# Both halves are implemented here for real — a hand-rolled member
# writer (header with FNAME, raw-deflate body, CRC32 + ISIZE trailer)
# and a member walker that parses the header fields (FEXTRA / FNAME /
# FCOMMENT / FHCRC per the spec), inflates with the built-in zlib, and
# verifies both trailer fields against the inflated bytes. zlib was
# already proven in-tree by the PNG codec; this extends it to the
# crawl container.


def gzip_member(data: bytes, name: str) -> bytes:
    """Hand-rolled RFC 1952 gzip member: fixed header (CM=deflate,
    FLG=FNAME, MTIME=0 for determinism, OS=unknown), the NUL-terminated
    FNAME, a raw-deflate stream, then the CRC32 + ISIZE trailer."""
    import zlib

    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    deflated = co.compress(data) + co.flush()
    header = (
        b"\x1f\x8b\x08\x08"          # magic, CM=8, FLG=FNAME
        + (0).to_bytes(4, "little")  # MTIME=0: byte-deterministic
        + b"\x00\xff"                # XFL, OS=unknown
        + name.encode("latin-1") + b"\x00"
    )
    trailer = (zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "little") + (
        len(data) & 0xFFFFFFFF
    ).to_bytes(4, "little")
    return header + deflated + trailer


def split_gzip_members(payload: bytes):
    """REAL gzip member walk over a concatenated-member stream: per
    member, verify the magic and CM, honor every FLG-declared optional
    field (FEXTRA length-prefixed, FNAME / FCOMMENT NUL-terminated,
    FHCRC two bytes), inflate the raw-deflate stream, and verify the
    CRC32 and ISIZE trailer against the inflated bytes. Yields
    (fname|None, inflated_bytes, isize). Fails loudly on bad magic,
    reserved FLG bits, truncation anywhere, or a trailer mismatch."""
    import zlib

    pos, n = 0, len(payload)
    while pos < n:
        if payload[pos:pos + 2] != b"\x1f\x8b":
            raise ValueError("bad gzip magic")
        if payload[pos + 2] != 8:
            raise ValueError("unsupported gzip compression method")
        flg = payload[pos + 3]
        if flg & 0xE0:
            raise ValueError("reserved gzip FLG bits set")
        p = pos + 10  # past MTIME, XFL, OS
        if flg & 0x04:  # FEXTRA
            if p + 2 > n:
                raise ValueError("truncated gzip FEXTRA length")
            p += 2 + int.from_bytes(payload[p:p + 2], "little")
        fname = None
        if flg & 0x08:  # FNAME
            z = payload.find(b"\x00", p)
            if z < 0:
                raise ValueError("unterminated gzip FNAME")
            fname = payload[p:z].decode("latin-1")
            p = z + 1
        if flg & 0x10:  # FCOMMENT
            z = payload.find(b"\x00", p)
            if z < 0:
                raise ValueError("unterminated gzip FCOMMENT")
            p = z + 1
        if flg & 0x02:  # FHCRC
            p += 2
        if p > n:
            raise ValueError("truncated gzip header")
        do = zlib.decompressobj(-15)
        data = do.decompress(payload[p:])
        if not do.eof:
            raise ValueError("truncated deflate stream")
        tail = n - len(do.unused_data)
        trailer = payload[tail:tail + 8]
        if len(trailer) != 8:
            raise ValueError("truncated gzip trailer")
        crc = int.from_bytes(trailer[:4], "little")
        isize = int.from_bytes(trailer[4:], "little")
        if crc != (zlib.crc32(data) & 0xFFFFFFFF):
            raise ValueError("gzip CRC32 mismatch")
        if isize != len(data) % 2**32:
            raise ValueError("gzip ISIZE mismatch")
        yield fname, data, isize
        pos = tail + 8


def record_spans(payload: bytes):
    """Frame offsets of each WARC record in an identity-encoded stream
    — (start, end) including the trailing CRLF CRLF separator. The
    minimal framing walk the .warc.gz writer needs to put one record
    per gzip member (the Common Crawl convention)."""
    pos, n = 0, len(payload)
    while pos < n:
        hdr_end = payload.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        headers = _parse_headers(
            payload[pos:hdr_end].partition(b"\r\n")[2]
        )
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        end = hdr_end + 4 + int(headers["content-length"]) + 4
        if end > n:
            raise ValueError("truncated WARC record")
        yield pos, end
        pos = end


WARC_GZ_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("member_idx", Ty.IntegerType()),
        Ty.StructField("warc_type", Ty.StringType()),
        Ty.StructField("content_length", Ty.LongType()),
        Ty.StructField("isize", Ty.LongType()),
        Ty.StructField("http_status", Ty.IntegerType()),
        Ty.StructField("payload_len", Ty.LongType()),
        Ty.StructField("body_text", Ty.StringType()),
    ]
)


def warc_gz_records(df: DataFrame) -> DataFrame:
    """The .warc.gz round-trip in one Arrow-batched stage: re-frame
    each WARC record of the identity-encoded `content` stream as its
    own hand-rolled gzip member (FNAME = 'rec{i}.warc'), concatenate
    them into the Common Crawl wire format, then walk the members back
    through the genuine gzip parser (header-field walk, raw-deflate
    inflate, CRC32 + ISIZE trailer verification) and hand each
    inflated member to the WARC/HTTP record parser. The emitted
    `isize` is each record's exact byte length as recovered from the
    gzip trailer — closed-form predictable by the oracle, so a framing
    bug in either half fails the driver hash."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_GZ_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                wire = b"".join(
                    gzip_member(payload[s:e], f"rec{i}.warc")
                    for i, (s, e) in enumerate(record_spans(payload))
                )
                for idx, (fname, data, isize) in enumerate(
                    split_gzip_members(wire)
                ):
                    if fname != f"rec{idx}.warc":
                        raise ValueError(
                            f"member {idx} carries FNAME {fname!r}"
                        )
                    recs = list(parse_warc(data))
                    if len(recs) != 1:
                        raise ValueError(
                            "gzip member must hold exactly one record"
                        )
                    wtype, clen, status, plen, body = recs[0]
                    rows.append(
                        (int(doc_id), idx, wtype, clen, isize,
                         status, plen, body)
                    )
            out = pd.DataFrame(rows, columns=cols)
            out["http_status"] = out["http_status"].astype("Int64")
            out["payload_len"] = out["payload_len"].astype("Int64")
            yield out

    return df.select("doc_id", "content").mapInPandas(
        _batches, schema=WARC_GZ_SCHEMA
    )


# --- robots.txt (RFC 9309): the crawl-politeness gate ------------------------
#
# Stage -1 of every crawl: before a fetcher touches a URL it must
# evaluate the host's robots.txt. The subtle parts are all in the
# matching, not the fetching — group selection (the most specific
# user-agent group applies, and ONLY that group), wildcard '*' and
# end-anchor '$' patterns, longest-match precedence over rule order,
# and allow-wins on equal specificity — so those are what this real
# parser + evaluator implement and what the oracle gates.


def parse_robots(txt: str):
    """REAL robots.txt parse per RFC 9309: '#' comments stripped,
    field names case-insensitive, consecutive User-agent lines open a
    group shared by all named agents, Allow/Disallow lines attach to
    the open group, unknown directives (Crawl-delay, Sitemap, ...) are
    ignored but CLOSE the user-agent run like the spec's start-of-group
    rule. Returns [(frozenset_of_agents_lower, [(allow_bool, pattern),
    ...]), ...]."""
    groups: list[tuple[frozenset, list]] = []
    agents: set[str] = set()
    rules: list[tuple[bool, str]] = []
    in_agent_run = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run and agents:
                groups.append((frozenset(agents), rules))
                agents, rules = set(), []
            agents.add(value.lower())
            in_agent_run = True
        elif field in ("allow", "disallow"):
            in_agent_run = False
            # an EMPTY value means "no paths match" (RFC 9309 §2.2.2:
            # 'Disallow:' with no value allows everything) — skipping
            # the rule, NOT treating '' as match-all, is load-bearing
            if agents and value:
                rules.append((field == "allow", value))
        else:
            in_agent_run = False  # unknown directive: ignored
    if agents:
        groups.append((frozenset(agents), rules))
    return groups


def _robots_match(pattern: str, path: str) -> bool:
    """RFC 9309 pattern match: literal octets, '*' matches any run
    (including empty), a trailing '$' anchors the end. Empty pattern
    matches everything. Translated to an anchored regex — a greedy
    first-occurrence scan is WRONG for '$'-anchored patterns (an
    earlier occurrence of a literal part can shadow the one that
    reaches the end); regex backtracking handles that correctly."""
    import re

    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = ".*".join(re.escape(p) for p in pattern.split("*"))
    return re.match(rx + ("$" if anchored else ""), path) is not None


def robots_decision(groups, agent: str, path: str):
    """Evaluate (agent, path) against parsed groups: pick the group
    with the LONGEST matching agent token ('*' only if nothing else
    matches — RFC 9309 group selection), then apply the longest
    matching rule, allow winning ties; no match = allowed. Returns
    (allowed, matched_pattern|None, match_len)."""
    agent = agent.lower()
    best_agents, best_len = None, -1
    star = None
    for agents, rules in groups:
        if "*" in agents:
            star = (agents, rules)
        for a in agents:
            if a != "*" and a in agent and len(a) > best_len:
                best_agents, best_len = (agents, rules), len(a)
    group = best_agents or star
    if group is None:
        return True, None, 0
    verdict, pat, plen = True, None, -1
    for allow, pattern in group[1]:
        if not _robots_match(pattern, path):
            continue
        score = len(pattern)
        if score > plen or (score == plen and allow and not verdict):
            verdict, pat, plen = allow, pattern, score
    return verdict, pat, max(plen, 0)


ROBOTS_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("path", Ty.StringType()),
        Ty.StructField("allowed", Ty.BooleanType()),
        Ty.StructField("matched_rule", Ty.StringType()),
        Ty.StructField("rule_len", Ty.IntegerType()),
    ]
)


def robots_eval(df: DataFrame, robots_txt: str, agent: str) -> DataFrame:
    """Arrow-batched robots gate over a `path` column: the constant
    robots.txt is parsed once per batch iterator (driver-constant,
    shipped in the closure), every path evaluated by the real RFC 9309
    matcher; one output row per input row, zero shuffle."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        groups = parse_robots(robots_txt)
        cols = [f.name for f in ROBOTS_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, path in zip(pdf["doc_id"], pdf["path"]):
                allowed, pat, plen = robots_decision(
                    groups, agent, str(path)
                )
                rows.append((int(doc_id), str(path), allowed, pat, plen))
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "path").mapInPandas(
        _batches, schema=ROBOTS_SCHEMA
    )


# --- WET: the crawl pipeline's OUTPUT format ---------------------------------

_WET_INFO_BODY = (
    "software: spark-graft/1.0\r\nformat: WARC File Format 1.1\r\n"
)

#: deterministic WARC-Date for every record: ISO 28500 §5.4 mandates
#: the header on each record but only requires UTC w3c-iso8601 form;
#: a fixed instant keeps the emitted stream a pure function of its
#: inputs (the oracle hash-compares the bytes) while staying
#: schema-valid for standard tooling.
_WET_DATE = "2026-01-01T00:00:00Z"


def _warc_record_id(*parts: str) -> str:
    """Deterministic `urn:uuid:` record id (ISO 28500 §5.2 mandates a
    globally unique id per record): an RFC 4122 name-based form built
    from the md5 of the record's identifying parts, version/variant
    bits set so the string parses as a v3 UUID."""
    import hashlib

    h = bytearray(hashlib.md5("\x00".join(parts).encode()).digest())
    h[6] = (h[6] & 0x0F) | 0x30  # version 3 (name-based, md5)
    h[8] = (h[8] & 0x3F) | 0x80  # RFC 4122 variant
    x = h.hex()
    return (f"urn:uuid:{x[:8]}-{x[8:12]}-{x[12:16]}-"
            f"{x[16:20]}-{x[20:32]}")


_WET_INFO = (
    "WARC/1.1\r\nWARC-Type: warcinfo\r\n"
    f"WARC-Date: {_WET_DATE}\r\n"
    f"WARC-Record-ID: <{_warc_record_id('warcinfo', _WET_INFO_BODY)}>\r\n"
    "Content-Length: " + str(len(_WET_INFO_BODY.encode())) + "\r\n"
    "\r\n" + _WET_INFO_BODY + "\r\n\r\n"
)


def wet_stream(pages: list[tuple[str, str]]) -> bytes:
    """REAL WET writer (the Common Crawl extracted-text profile of
    ISO 28500): one warcinfo record, then one 'conversion' record per
    page — WARC-Target-URI names the source page, Content-Type
    text/plain, Content-Length counts the UTF-8 bytes of the extracted
    text, block followed by the mandatory CRLF CRLF separator. Each
    record carries the ISO-28500-mandatory WARC-Record-ID (urn:uuid
    derived deterministically from the record content) and WARC-Date
    (fixed instant) so standard WARC tooling accepts the stream, while
    the bytes stay a pure function of `pages` for oracle hashing."""
    out = [_WET_INFO]
    for uri, text in pages:
        body = text.encode("utf-8")
        out.append(
            "WARC/1.1\r\nWARC-Type: conversion\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: {_WET_DATE}\r\n"
            f"WARC-Record-ID: <{_warc_record_id('conversion', uri, text)}>\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        )
        out.append(body.decode("utf-8"))
        out.append("\r\n\r\n")
    return "".join(out).encode("utf-8")


WET_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("n_records", Ty.IntegerType()),
        Ty.StructField("warc_type", Ty.StringType()),
        Ty.StructField("content_length", Ty.LongType()),
        Ty.StructField("target_uri", Ty.StringType()),
        Ty.StructField("body_text", Ty.StringType()),
    ]
)


def wet_roundtrip(df: DataFrame) -> DataFrame:
    """The crawl pipeline's write side, composed and verified in one
    Arrow-batched stage: REAL HTML text extraction over the `html`
    column, a REAL WET file written from the extraction, and the REAL
    WARC walker re-parsing it — the emitted row carries the re-parsed
    conversion record, and the stage fails loudly if the round-tripped
    text differs from what was extracted."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WET_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                text, _tags, _drops, _comments = extract_html_text(html)
                uri = f"https://crawl.example/doc/{int(doc_id)}"
                wet = wet_stream([(uri, text)])
                recs = list(parse_warc(wet))
                if len(recs) != 2 or recs[0][0] != "warcinfo":
                    raise ValueError("malformed WET stream written")
                wtype, clen, _status, _plen, body = recs[1]
                if wtype != "conversion" or body != text:
                    raise ValueError("WET round-trip lost the text")
                rows.append(
                    (int(doc_id), len(recs), wtype, clen, uri, body)
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "html").mapInPandas(
        _batches, schema=WET_SCHEMA
    )


# --- hyperlink extraction (the link-graph feed) ------------------------------


def _tag_attrs(tag_body: str) -> dict[str, str]:
    """Parse the attribute list of one tag body (everything between
    '<' and the walk-determined '>'), quote-aware: names are
    case-folded, values may be single- or double-quoted (quotes can
    contain '>', spaces, '='), or unquoted (terminated by whitespace).
    A name with no '=' maps to ''. First occurrence wins (HTML5
    duplicate-attribute rule)."""
    attrs: dict[str, str] = {}
    # drop the tag name (first whitespace-delimited token)
    parts = tag_body.split(None, 1)
    if len(parts) < 2:
        return attrs
    s = parts[1]
    i, n = 0, len(s)
    while i < n:
        while i < n and s[i] in " \t\r\n/":
            i += 1
        if i >= n:
            break
        j = i
        while j < n and s[j] not in " \t\r\n=/":
            j += 1
        name = s[i:j].lower()
        i = j
        while i < n and s[i] in " \t\r\n":
            i += 1
        if i < n and s[i] == "=":
            i += 1
            while i < n and s[i] in " \t\r\n":
                i += 1
            if i < n and s[i] in ("'", '"'):
                q = s[i]
                end = s.find(q, i + 1)
                if end < 0:
                    raise ValueError("unterminated attribute quote")
                value = s[i + 1:end]
                i = end + 1
            else:
                j = i
                while j < n and s[j] not in " \t\r\n":
                    j += 1
                value = s[i:j]
                i = j
        else:
            value = ""
        if name and name not in attrs:
            attrs[name] = value
    return attrs


def extract_hrefs(html: str) -> tuple[list[str], int]:
    """REAL hyperlink extraction — the link-graph feed every crawler
    builds its frontier and its PageRank edge list from: one pass of
    the same quote-aware tag walk as extract_html_text, collecting the
    href attribute of every <a> tag in document order while refusing
    the classic traps (an anchor spelled inside a <script> string or an
    HTML comment is NOT a link; a '>' inside a quoted attribute value
    must not terminate the tag that carries the href; an <a> without
    an href contributes nothing). Returns (hrefs, n_anchors) where
    n_anchors counts real <a> tags seen (with or without href)."""
    hrefs: list[str] = []
    n_anchors = 0
    i, n = 0, len(html)
    skip_until: str | None = None
    while i < n:
        if html[i] != "<":
            i += 1
            continue
        if html.startswith("<!--", i):
            end = html.find("-->", i + 4)
            if end < 0:
                raise ValueError("unterminated comment")
            i = end + 3
            continue
        if html.startswith("<!", i):
            end = html.find(">", i)
            if end < 0:
                raise ValueError("unterminated declaration")
            i = end + 1
            continue
        j = i + 1
        quote: str | None = None
        while j < n:
            ch = html[j]
            if quote:
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == ">":
                break
            j += 1
        if j >= n:
            raise ValueError("unterminated tag")
        tag_body = html[i + 1:j]
        i = j + 1
        closing = tag_body.startswith("/")
        name = (
            tag_body[1:] if closing else tag_body
        ).split(None, 1)[0].rstrip("/").lower()
        if skip_until is not None:
            if closing and name == skip_until:
                skip_until = None
            continue
        if not closing and name in ("script", "style"):
            skip_until = name
            continue
        if not closing and name == "a":
            n_anchors += 1
            href = _tag_attrs(tag_body).get("href")
            if href:
                hrefs.append(href)
    return hrefs, n_anchors


LINKS_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("hrefs", Ty.ArrayType(Ty.StringType())),
        Ty.StructField("n_anchors", Ty.IntegerType()),
    ]
)


def extract_links(df: DataFrame) -> DataFrame:
    """Arrow-batched distributed hyperlink extraction over an `html`
    string column; one output row per document carrying the ordered
    href list and the anchor count."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in LINKS_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                hrefs, n_anchors = extract_hrefs(html or "")
                rows.append((int(doc_id), hrefs, n_anchors))
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "html").mapInPandas(
        _batches, schema=LINKS_SCHEMA
    )


# --- sitemap XML parsing ------------------------------------------------------

#: leaf children the sitemap protocol defines on <url>/<sitemap>;
#: anything else inside an entry is ignored (spec-tolerant)
_SM_LEAVES = ("loc", "lastmod", "changefreq", "priority")


def parse_sitemap(xml: str) -> tuple[str, list[dict], list[dict]]:
    """REAL sitemap-protocol XML parse (sitemaps.org) — the crawl
    DISCOVERY step next to robots.txt: a single quote-aware walk over
    the markup that handles XML declarations, comments (a fake <url>
    inside one must not count), CDATA sections (content is VERBATIM —
    no entity decode, the classic trap), named/numeric entity decoding
    in ordinary text, attribute values containing '>' that must not
    close their tag, self-closing unknown elements, and
    whitespace-padded leaf values (trimmed per spec). Returns
    (root kind, url entries, nested sitemap entries); each entry is a
    dict of whichever _SM_LEAVES its element carried. Fails loudly
    (ValueError) on unterminated constructs — off-contract wire bytes
    must never parse silently."""
    i, n = 0, len(xml)
    root: str | None = None
    stack: list[str] = []
    cur: dict | None = None
    cur_kind: str | None = None  # 'url' | 'sitemap'
    text: list[str] = []
    cdata = False
    urls: list[dict] = []
    nested: list[dict] = []
    while i < n:
        c = xml[i]
        if c != "<":
            text.append(c)
            i += 1
            continue
        if xml.startswith("<!--", i):
            end = xml.find("-->", i + 4)
            if end < 0:
                raise ValueError("unterminated comment")
            i = end + 3
            continue
        if xml.startswith("<![CDATA[", i):
            end = xml.find("]]>", i + 9)
            if end < 0:
                raise ValueError("unterminated CDATA")
            text.append(xml[i + 9:end])
            cdata = True
            i = end + 3
            continue
        if xml.startswith("<?", i):
            end = xml.find("?>", i + 2)
            if end < 0:
                raise ValueError("unterminated declaration")
            i = end + 2
            continue
        j = i + 1
        quote: str | None = None
        while j < n:
            ch = xml[j]
            if quote:
                if ch == quote:
                    quote = None
            elif ch in ("'", '"'):
                quote = ch
            elif ch == ">":
                break
            j += 1
        if j >= n:
            raise ValueError("unterminated tag")
        tag_body = xml[i + 1:j]
        i = j + 1
        closing = tag_body.startswith("/")
        selfclose = tag_body.endswith("/") and not closing
        name = (
            (tag_body[1:] if closing else tag_body)
            .split(None, 1)[0]
            .rstrip("/")
            .lower()
        )
        name = name.rsplit(":", 1)[-1]  # strip namespace prefix
        if closing:
            if not stack or stack[-1] != name:
                raise ValueError(f"mismatched close </{name}>")
            stack.pop()
            if cur is not None and name in _SM_LEAVES:
                raw = "".join(text)
                cur[name] = raw if cdata else _decode_entities(
                    raw
                ).strip()
            elif cur is not None and name == cur_kind:
                (urls if cur_kind == "url" else nested).append(cur)
                cur, cur_kind = None, None
            text, cdata = [], False
            continue
        if root is None:
            if name not in ("urlset", "sitemapindex"):
                raise ValueError(f"unknown root <{name}>")
            root = name
        if not selfclose:
            stack.append(name)
            if name in ("url", "sitemap") and cur is None:
                cur, cur_kind = {}, name
        text, cdata = [], False
    if stack:
        raise ValueError(f"unclosed <{stack[-1]}>")
    if root is None:
        raise ValueError("no root element")
    return root, urls, nested


SITEMAP_SCHEMA = Ty.StructType(
    [
        Ty.StructField("doc_id", Ty.LongType()),
        Ty.StructField("kind", Ty.StringType()),
        Ty.StructField("n_urls", Ty.IntegerType()),
        Ty.StructField("n_nested", Ty.IntegerType()),
        Ty.StructField("locs_len", Ty.LongType()),
        Ty.StructField("pr_sum_milli", Ty.LongType()),
        Ty.StructField("n_daily", Ty.IntegerType()),
        Ty.StructField("max_lastmod", Ty.StringType()),
    ]
)


def sitemap_stats(df: DataFrame) -> DataFrame:
    """Arrow-batched distributed sitemap parse over an `xml` string
    column; one output row per document (decoded-loc length sum,
    priority sum in exact milli-units, daily-changefreq count, max
    lastmod) — every field a closed-form function of the synthesized
    wire bytes, so the oracle gates the parser without running one."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SITEMAP_SCHEMA.fields]
        for pdf in it:
            rows = []
            for doc_id, xml in zip(pdf["doc_id"], pdf["xml"]):
                kind, urls, nested = parse_sitemap(xml or "")
                entries = urls + nested
                locs_len = sum(
                    len(e["loc"]) for e in entries if "loc" in e
                )
                pr = sum(
                    round(float(e["priority"]) * 1000)
                    for e in urls
                    if "priority" in e
                )
                daily = sum(
                    1 for e in urls if e.get("changefreq") == "daily"
                )
                lastmods = [
                    e["lastmod"] for e in entries if "lastmod" in e
                ]
                rows.append(
                    (
                        int(doc_id),
                        kind,
                        len(urls),
                        len(nested),
                        locs_len,
                        pr,
                        daily,
                        max(lastmods) if lastmods else None,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select("doc_id", "xml").mapInPandas(
        _batches, schema=SITEMAP_SCHEMA
    )
