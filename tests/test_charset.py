"""Charset sniffing tests — the messy-encoding ingest twin."""

from __future__ import annotations

from text_to_graph_spark.kit.charset import detect_decode


def test_bom_variants_and_strict_utf8():
    assert detect_decode("héllo ☂".encode("utf-8")) == ("utf-8", "héllo ☂")
    assert detect_decode(b"\xef\xbb\xbf" + "héllo".encode("utf-8")) == (
        "utf-8",
        "héllo",
    )
    assert detect_decode(b"\xff\xfe" + "héllo λ".encode("utf-16-le")) == (
        "utf-16-le",
        "héllo λ",
    )
    assert detect_decode(b"\xfe\xff" + "Ω≈".encode("utf-16-be")) == (
        "utf-16-be",
        "Ω≈",
    )


def test_cp1252_fallback_and_c1_latin1_terminal():
    # 0x80 is € in cp1252 and invalid utf-8: must fall through to cp1252
    assert detect_decode(b"cost: \x80 5") == ("windows-1252", "cost: € 5")
    # 0x81 is undefined in cp1252: terminal latin-1 fallback (C1 control),
    # still labeled windows-1252 (the WHATWG treat-as-C1 behavior)
    enc, text = detect_decode(b"x\x81y")
    assert enc == "windows-1252"
    assert text == "x\x81y"
    # every byte string decodes — ingest never raises
    assert detect_decode(bytes(range(256)))[0] in ("windows-1252",)


def test_spark_legacy_pages_sniff_and_extract(spark):
    import pandas as pd

    from text_to_graph_spark.sources.charset import (
        _DECOR,
        _ENC,
        synthesize_legacy_pages,
        transcode_extract,
    )

    sf = "/root/testdata/sf0.001"
    out = transcode_extract(synthesize_legacy_pages(spark, sf)).toPandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    expect = {
        f"doc_{int(d)}": (str(t) + _DECOR[int(d) % 4], _ENC[int(d) % 4])
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    assert len(out) == len(docs)
    for url, enc, text in zip(out["url"], out["encoding"], out["text"]):
        doc_id = int(url.rsplit("/", 1)[1])
        exp_text, exp_enc = expect[f"doc_{doc_id}"]
        assert enc == exp_enc, url
        # the decoration survived the legacy-charset wire roundtrip exactly
        assert text == exp_text, url


def test_transcode_plan_is_single_python_stage(spark):
    from text_to_graph_spark.plans.introspect import (
        count_exchanges,
        python_eval_count,
    )
    from text_to_graph_spark.sources.charset import (
        synthesize_legacy_pages,
        transcode_extract,
    )

    t = transcode_extract(synthesize_legacy_pages(spark, "/root/testdata/sf0.001"))
    # synth + sniff/extract are two chained mapInPandas projections with
    # no shuffle beyond the sandbox-only input repartition
    assert python_eval_count(t) == 2
    assert count_exchanges(t) <= 1
