"""JSONL/CSV document-source ingestion: schema-pinned permissive reads,
quarantine isolation, stable content-hash ids."""

import json

import pytest

from nasctn_sea_ingest_spark.sources.text_ingest import (
    read_documents, split_quarantine)


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "corpus"
    p.mkdir()
    rows = [{"doc_id": 1, "text": "hello world", "lang": "en"},
            {"doc_id": 2, "text": "bonjour le monde", "lang": "fr",
             "source": "crawl-A"},
            {"text": "no id line"}]
    (p / "shard-000.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n{not json at all\n")
    return str(p)


def test_jsonl_read_and_quarantine(spark, jsonl_dir):
    df = read_documents(spark, jsonl_dir, fmt="jsonl")
    good, bad = split_quarantine(df)
    g = {r.doc_id: r for r in good.collect()}
    assert g[1].text == "hello world" and g[1].lang == "en"
    assert g[1].n_chars == 11
    assert g[1].source == "shard-000.jsonl"     # derived from file name
    assert g[2].source == "crawl-A"             # explicit column wins
    # the id-less row got a synthesized id, stable across re-reads
    synth = [r for r in g.values() if r.text == "no id line"]
    assert len(synth) == 1 and synth[0].doc_id is not None
    again = {r.text: r.doc_id
             for r in split_quarantine(
                 read_documents(spark, jsonl_dir))[0].collect()}
    assert again["no id line"] == synth[0].doc_id
    # the corrupt line is quarantined with its raw bytes, not dropped
    q = bad.collect()
    assert len(q) == 1 and "{not json" in q[0].raw_record


def test_csv_read(spark, tmp_path):
    p = tmp_path / "csv"
    p.mkdir()
    (p / "docs.csv").write_text(
        "doc_id,text,lang\n10,alpha beta,en\n11,gamma,de\n")
    good, bad = split_quarantine(
        read_documents(spark, str(p), fmt="csv"))
    g = {r.doc_id: r for r in good.collect()}
    assert g[10].text == "alpha beta" and g[11].lang == "de"
    assert bad.count() == 0


def test_bad_format_rejected(spark):
    with pytest.raises(ValueError):
        read_documents(spark, "/nope", fmt="xml")
