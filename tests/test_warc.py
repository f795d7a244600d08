"""WARC codec + segment source tests — the Common-Crawl ingest twin."""

from __future__ import annotations

import gzip

import pytest

from text_to_graph_spark.kit.warc import decode_segment, encode_record


def test_record_roundtrip_and_member_concatenation():
    recs = [
        ("https://a.test/1", 1735689600, b"<html>a</html>"),
        ("https://b.test/2", 1735689601, b""),
        ("https://c.test/3", 1735776000, bytes(range(256)) * 3),
    ]
    seg = b"".join(encode_record(*r) for r in recs)
    assert decode_segment(seg) == recs
    # deterministic bytes: same record encodes identically (mtime pinned)
    assert encode_record(*recs[0]) == encode_record(*recs[0])


def test_malformed_segments_raise():
    good = encode_record("https://a.test", 1735689600, b"x")
    with pytest.raises(ValueError, match="truncated|bad gzip"):
        decode_segment(good[:-4])
    with pytest.raises(ValueError, match="bad gzip"):
        decode_segment(b"not gzip at all")
    # valid gzip member, not a WARC record
    with pytest.raises(ValueError, match="version|terminator"):
        decode_segment(gzip.compress(b"HTTP/1.1 200 OK\r\n\r\nbody\r\n\r\n", mtime=0))
    # Content-Length that does not tile the body
    raw = gzip.decompress(good)
    bad = gzip.compress(raw.replace(b"Content-Length: 1", b"Content-Length: 2"), mtime=0)
    with pytest.raises(ValueError, match="tile"):
        decode_segment(bad)


def test_spark_segments_roundtrip_pages_exactly(spark, pages_smoke):
    from pyspark.sql import functions as F

    from text_to_graph_spark.sources.warc import (
        pages_to_warc_segments,
        warc_segments_to_pages,
    )

    segs = pages_to_warc_segments(pages_smoke, n_segments=4).localCheckpoint()
    stats = segs.select(
        F.count("*").alias("n_segs"), F.sum("n_records").alias("n_recs")
    ).collect()[0]
    assert stats.n_segs == 4
    assert stats.n_recs == pages_smoke.count()

    back = warc_segments_to_pages(segs)
    orig = {
        r.url: (r.warc_ts, bytes(r.html))
        for r in pages_smoke.select("url", "warc_ts", "html").collect()
    }
    got = {r.url: (r.warc_ts, bytes(r.html)) for r in back.collect()}
    # bit-exact roundtrip INCLUDING the WARC-Date timestamp
    assert got == orig


def test_segment_bytes_deterministic_under_repartitioning(spark, pages_smoke):
    from text_to_graph_spark.sources.warc import pages_to_warc_segments

    a = {
        r.segment_id: bytes(r.warc)
        for r in pages_to_warc_segments(pages_smoke.repartition(7)).collect()
    }
    b = {
        r.segment_id: bytes(r.warc)
        for r in pages_to_warc_segments(pages_smoke.coalesce(1)).collect()
    }
    assert a == b


def test_warc_plan_shapes(spark, pages_smoke):
    from text_to_graph_spark.plans.introspect import (
        count_exchanges,
        python_eval_count,
    )
    from text_to_graph_spark.sources.warc import (
        pages_to_warc_segments,
        warc_segments_to_pages,
    )

    segs = pages_to_warc_segments(pages_smoke)
    # the writer pays exactly its bin-pack shuffle (plus the sandbox-only
    # input repartition baked into pages_smoke's lineage)
    assert count_exchanges(segs) <= 2
    # the reader adds NO exchange on top of checkpointed segments: a pure
    # 1->N expansion, parallel by segment
    ck = segs.localCheckpoint()
    back = warc_segments_to_pages(ck)
    assert count_exchanges(back) == 0
    assert python_eval_count(back) == 1
