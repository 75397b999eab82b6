"""WARC walk (ISO 28500): record round-trip, Common-Crawl .warc.gz
member-per-record composite, malformed-record rejection, and the
end-to-end query's stats against the planted-crawl definition."""

from __future__ import annotations

import gzip
import zlib

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import multimodal10 as W
from mit_6_5840_mapreduce_with_go_spark.operators import multimodal9 as M9


def _rec(t="response", content=b"hello world", **kw):
    kw.setdefault("record_id", "test-1")
    kw.setdefault("target_uri", "http://ex.com/a" if t != "warcinfo" else None)
    return W.encode_warc_record(t, content, **kw)


def test_warc_roundtrip_plain():
    pay = (
        _rec("warcinfo", b"software: x", record_id="i", target_uri=None)
        + _rec("request", b"GET /a", record_id="q")
        + _rec("response", b"<html>hi</html>", record_id="r")
    )
    recs = W.decode_warc(pay)
    assert [r["type"] for r in recs] == ["warcinfo", "request", "response"]
    assert recs[2]["content"] == b"<html>hi</html>"
    assert recs[2]["uri"] == "http://ex.com/a"
    assert recs[0]["uri"] is None
    assert recs[1]["record_id"] == "<urn:uuid:q>"


def test_warc_header_names_case_insensitive():
    pay = bytearray(_rec())
    # uppercase a header name: WARC-TYPE
    i = pay.find(b"WARC-Type")
    pay[i : i + 9] = b"WARC-TYPE"
    assert W.decode_warc(bytes(pay))[0]["type"] == "response"


def test_warc_body_may_contain_separators():
    """Content-Length delimits the body — a body full of CRLFCRLF and
    fake version lines must NOT desynchronize the walk."""
    evil = b"\r\n\r\nWARC/1.0\r\n\r\n" * 3
    pay = _rec(content=evil) + _rec(content=b"after", record_id="x")
    recs = W.decode_warc(pay)
    assert recs[0]["content"] == evil and recs[1]["content"] == b"after"


def test_warc_rejects_malformed():
    good = _rec()
    with pytest.raises(ValueError, match="bad WARC version"):
        W.decode_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="empty WARC"):
        W.decode_warc(b"")
    with pytest.raises(ValueError, match="missing record separator"):
        W.decode_warc(good[:-1])
    with pytest.raises(ValueError, match="truncated body"):
        # inflate Content-Length past the payload
        W.decode_warc(good.replace(b"Content-Length: 11", b"Content-Length: 99"))
    with pytest.raises(ValueError, match="non-numeric Content-Length"):
        W.decode_warc(good.replace(b"Content-Length: 11", b"Content-Length: ab"))
    with pytest.raises(ValueError, match="missing Content-Length"):
        W.decode_warc(good.replace(b"Content-Length: 11", b"X-Other: 1"))
    with pytest.raises(ValueError, match="duplicate header"):
        W.decode_warc(
            good.replace(b"WARC-Date:", b"Content-Length: 11\r\nWARC-Date:")
        )
    with pytest.raises(ValueError, match="malformed header line"):
        W.decode_warc(good.replace(b"Content-Type: ", b"Content-Type= "))
    with pytest.raises(ValueError, match="missing mandatory field"):
        W.decode_warc(good.replace(b"WARC-Date: ", b"X-Date: "))


def test_warc_gz_member_per_record():
    """The Common-Crawl layout: each record its own gzip member.  Our
    members also decompress with the stdlib (cross-validation), and a
    stdlib-compressed record parses back."""
    pay = W._warc_crawl(7)
    recs = W.decode_warc_gz(pay)
    assert recs[0]["type"] == "warcinfo"
    assert [r["type"] for r in recs[1:]] == ["request", "response"] * 2
    # stdlib agrees member-by-member
    assert gzip.decompress(pay) == b"".join(
        m["data"] for m in M9.decode_gzip_stream(pay)
    )
    std = gzip.compress(_rec())
    assert W.decode_warc_gz(std)[0]["content"] == b"hello world"


def test_warc_gz_rejects_multi_record_member():
    two = _rec(record_id="a") + _rec(record_id="b")
    with pytest.raises(ValueError, match="holds 2 records"):
        W.decode_warc_gz(M9.encode_gzip_member(two))


def test_warc_query_consistency(spark):
    rows = W.mm_decode_warc_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:50]:
        d = r["doc_id"]
        k = 1 + d % 3
        toks = [W._warc_tokens(d, s) for s in range(k)]
        assert r["n_records"] == 1 + 2 * k
        assert r["n_responses"] == k
        assert r["resp_n_tokens"] == sum(len(t) for t in toks)
        assert r["resp_token_sum"] == sum(sum(t) for t in toks)
        assert r["resp_bytes"] == sum(
            len(" ".join(str(v) for v in t)) for t in toks
        )


def test_tar_pax_query_consistency(spark):
    rows = W.mm_decode_tar_pax_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:50]:
        ms = W._pax_members(r["doc_id"])
        assert r["n_members"] == len(ms)
        assert r["n_long_names"] == sum(1 for n, _, _ in ms if len(n) > 100)
        assert r["n_long_names"] >= 1  # the corpus exercises the long path
        assert r["name_len_sum"] == sum(len(n) for n, _, _ in ms)
        assert r["mtime_sum"] == sum(t for _, t, _ in ms)
        assert r["content_sum"] == sum(sum(c) for _, _, c in ms)


def test_zip_stream_query_consistency(spark):
    rows = W.mm_decode_zip_stream_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:50]:
        ms = W._zips_members(r["doc_id"])
        assert r["n_members"] == len(ms)
        assert r["n_streamed"] == sum(1 for m in ms if m[3])
        assert r["n_streamed"] >= 1
        assert r["n_deflated"] == sum(1 for m in ms if m[2])
        assert r["content_sum"] == sum(sum(m[1]) for m in ms)


# --------------------------------------------------------------------------
# HTTP envelope (RFC 9112): chunked + length-delimited bodies
# --------------------------------------------------------------------------


def test_http_roundtrip_both_framings():
    body = b"the payload " * 30
    for chunked in (False, True):
        raw = W.encode_http_response(
            200, "OK", [("Content-Type", "text/plain"), ("X-A", "b")],
            body, chunked=chunked,
        )
        out = W.parse_http_response(raw)
        assert out["status"] == 200 and out["reason"] == "OK"
        assert out["chunked"] is chunked
        assert out["body"] == body
        assert ("content-type", "text/plain") in out["headers"]
    # empty body, both framings
    for chunked in (False, True):
        raw = W.encode_http_response(204, "No Content", [], b"", chunked=chunked)
        assert W.parse_http_response(raw)["body"] == b""


def test_http_chunk_extensions_and_trailers():
    """Wild chunked bodies carry chunk extensions (';name=value' after
    the hex size) and trailer fields after the 0-chunk — both legal and
    both ignored for the payload."""
    raw = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"5;ext=1\r\nhello\r\n"
        b"6\r\n world\r\n"
        b"0\r\nX-Trailer: v\r\n\r\n"
    )
    out = W.parse_http_response(raw)
    assert out["body"] == b"hello world"


def test_http_rejects_malformed():
    good = W.encode_http_response(200, "OK", [], b"abcde")
    with pytest.raises(ValueError, match="bad status line"):
        W.parse_http_response(b"ICY 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="non-integer status"):
        W.parse_http_response(b"HTTP/1.1 2xx OK\r\n\r\n")
    with pytest.raises(ValueError, match="out of range"):
        W.parse_http_response(b"HTTP/1.1 999 Huh\r\nContent-Length: 0\r\n\r\n")
    with pytest.raises(ValueError, match="no Content-Length"):
        W.parse_http_response(b"HTTP/1.1 200 OK\r\nX: y\r\n\r\nbody")
    with pytest.raises(ValueError, match="Content-Length"):
        W.parse_http_response(good[:-1])  # short body
    chunked = W.encode_http_response(200, "OK", [], b"hello world", chunked=True)
    with pytest.raises(ValueError, match="bad chunk size"):
        W.parse_http_response(chunked.replace(b"\r\n7\r\n", b"\r\nzz\r\n", 1))
    with pytest.raises(ValueError, match="not CRLF-terminated"):
        # corrupt the CRLF after the first chunk's data
        i = chunked.find(b"hello w") + 7
        W.parse_http_response(chunked[:i] + b"XY" + chunked[i + 2:])
    with pytest.raises(ValueError, match="bytes after chunked body"):
        W.parse_http_response(chunked + b"junk")


def test_warc_http_query_consistency(spark):
    rows = W.mm_warc_http_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:50]:
        d = r["doc_id"]
        k = 1 + d % 3
        toks = [W._http_tokens(d, s) for s in range(k)]
        assert r["n_responses"] == k
        assert r["n_chunked"] == sum(1 for s in range(k) if s % 2 == 0)
        assert r["n_ok"] == sum(1 for s in range(k) if (d + s) % 2 == 0)
        assert r["body_token_sum"] == sum(sum(t) for t in toks)
        assert r["body_bytes"] == sum(
            len(" ".join(str(v) for v in t)) for t in toks
        )


# --------------------------------------------------------------------------
# UTF-8 validation (RFC 3629), zlib container (RFC 1950), URL analytics
# --------------------------------------------------------------------------


def test_utf8_validator_matches_cpython_on_random_bytes():
    """The maximal-subpart replacement count must equal the number of
    U+FFFD CPython's errors='replace' substitutes — property-tested
    over random byte strings (the strongest cross-validation available
    in-container)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=64))
    def check(data):
        out = W.validate_utf8(data)
        decoded = data.decode("utf-8", "replace")
        assert out["n_replacements"] == decoded.count("�")
        n_valid = sum(1 for ch in decoded if ch != "�")
        assert out["n_1b"] + out["n_2b"] + out["n_3b"] + out["n_4b"] == n_valid
        assert out["cp_sum"] == sum(
            ord(ch) for ch in decoded if ch != "�"
        )

    check()


def test_utf8_validator_edge_table():
    """The classic ill-formed table: overlongs, surrogates, > U+10FFFF,
    truncations — counted exactly as the Unicode maximal-subpart policy
    prescribes."""
    cases = {
        b"\x80": 1,  # lone continuation
        b"\xc0\xaf": 2,  # overlong '/': C0 never valid
        b"\xe0\x80\x80": 3,  # overlong: E0 needs A0-BF second
        b"\xed\xa0\x80": 3,  # surrogate D800
        b"\xf4\x90\x80\x80": 4,  # > U+10FFFF
        b"\xc2": 1,  # truncated 2-byte
        b"\xe4\xb8": 1,  # truncated 3-byte (valid prefix = 1 subpart)
        b"\xf0\x9f\x98": 1,  # truncated 4-byte
        b"\xf0\x28\x8c\x28": 2,  # bad continuations around ASCII
    }
    for data, want in cases.items():
        assert W.validate_utf8(data)["n_replacements"] == want, data
    ok = "aé中\U0001f600".encode()
    out = W.validate_utf8(ok)
    assert (out["n_1b"], out["n_2b"], out["n_3b"], out["n_4b"]) == (1, 1, 1, 1)
    assert out["n_replacements"] == 0
    assert out["cp_sum"] == sum(ord(c) for c in "aé中\U0001f600")


def test_zlib_roundtrip_and_stdlib_interop():
    data = b"zlib wrapped payload " * 40
    for level in (1, 6, 9):
        pay = W.encode_zlib_container(data, level=level)
        assert W.decode_zlib_container(pay)["data"] == data
        assert zlib.decompress(pay) == data  # stdlib reads ours
    std = zlib.compress(data, 6)  # ours reads stdlib
    assert W.decode_zlib_container(std)["data"] == data


def test_zlib_rejects_malformed():
    good = W.encode_zlib_container(b"hello world")
    with pytest.raises(ValueError, match="FCHECK"):
        W.decode_zlib_container(bytes([good[0], good[1] ^ 0x01]) + good[2:])
    with pytest.raises(ValueError, match="compression method"):
        W.decode_zlib_container(bytes([0x79 & 0xF0 | 7, 0]) + good[2:])
    with pytest.raises(ValueError, match="FDICT"):
        cmf = 0x78
        flg = 0x20
        flg |= 31 - (cmf * 256 + flg) % 31
        W.decode_zlib_container(bytes([cmf, flg]) + good[2:])
    with pytest.raises(ValueError, match="Adler-32"):
        W.decode_zlib_container(good[:-1] + bytes([good[-1] ^ 0xFF]))
    with pytest.raises(ValueError, match="trailing garbage"):
        W.decode_zlib_container(good + b"x")
    with pytest.raises(ValueError, match="truncated"):
        W.decode_zlib_container(good[:4])


def test_url_host_stats_plan_is_jvm_native(spark):
    """The URL query must stay whole-stage-codegen'd: no Python worker
    anywhere in the plan (this is the point of the parse_url path)."""
    df = W.text_url_host_stats(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()
    rows = {r["host"]: r for r in df.collect()}
    # 50 x 7 residue pairs exist only where solutions to the CRT system
    # exist among doc_ids; spot-check one known host
    import math
    assert len(rows) > 0
    total = sum(r["n_urls"] for r in rows.values())
    assert total == 500  # sf0.001 documents


def test_quarantine_query_consistency(spark):
    rows = W.mm_decode_quarantine_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    n_bad = sum(1 for r in rows if r["ok"] == 0)
    assert n_bad == sum(1 for r in rows if r["doc_id"] % 7 == 0)
    for r in rows[:60]:
        d = r["doc_id"]
        if d % 7 == 0:
            assert (r["ok"], r["n_tokens"], r["token_sum"]) == (0, -1, -1)
        else:
            toks = W._quar_tokens(d)
            assert (r["ok"], r["n_tokens"], r["token_sum"]) == (
                1, len(toks), sum(toks),
            )


def test_warc_wet_conversion_records():
    """WET files (the Common-Crawl extracted-text sibling) are WARC
    files whose payload records carry WARC-Type: conversion and a
    WARC-Refers-To header — the generic record walk must surface them
    untouched."""
    rec = W.encode_warc_record(
        "conversion",
        "extracted plain text\nsecond line".encode(),
        record_id="wet-1",
        target_uri="http://ex.com/page",
        content_type="text/plain",
    )
    # splice a WARC-Refers-To field in (any named field is legal)
    rec = rec.replace(
        b"WARC-Date:", b"WARC-Refers-To: <urn:uuid:orig-1>\r\nWARC-Date:"
    )
    out = W.decode_warc(M9.decode_gzip_member(M9.encode_gzip_member(rec))["data"])
    assert out[0]["type"] == "conversion"
    assert out[0]["content"].startswith(b"extracted plain text")
    # and through the .warc.gz composite path
    assert W.decode_warc_gz(M9.encode_gzip_member(rec))[0]["type"] == "conversion"
