"""Registry surface, archive URI rewriting, gold-standard input."""

import pyarrow as pa
import pytest

import ray.data

from raydedup.functions.archiveuri import generate_raw_urim
from raydedup.registry import (
    supported_collection_measures,
    supported_input_types,
    supported_output_types,
    supported_timemap_measures,
)
from raydedup.stages.exact import add_row_key


def test_registry_shape_matches_reference_surface():
    # every measure entry carries the reference registry fields
    for name, entry in supported_timemap_measures.items():
        assert set(entry) >= {"function", "comparison direction",
                              "default threshold"}
    assert supported_timemap_measures["jaccard"]["default threshold"] == 0.96
    assert supported_timemap_measures["cosine"]["comparison direction"] == "<"
    assert "collection_jaccard" in supported_collection_measures
    assert {"parquet", "documents", "goldtest"} <= set(supported_input_types)
    assert {"parquet", "json", "csv", "csv_report", "golddatafile",
            "goldstandard"} <= set(supported_output_types)


def test_registry_measure_function_runs():
    tbl = pa.table(
        {
            "conv_id": ["c", "c"],
            "turn_idx": pa.array([0, 1], type=pa.int32()),
            "text": ["alpha beta gamma delta", "alpha beta gamma delta"],
        }
    )
    ds = add_row_key(ray.data.from_arrow(tbl), ["conv_id", "turn_idx"])
    out = supported_timemap_measures["jaccard"]["function"](ds).take_all()
    assert {r["jaccard"] for r in out} == {0.0}


def test_generate_raw_urim():
    u = "https://web.archive.org/web/20180128152127/http://example.com/a"
    raw = generate_raw_urim(u)
    assert raw == ("https://web.archive.org/web/20180128152127id_/"
                   "http://example.com/a")
    # idempotent (the reference's asserted property)
    assert generate_raw_urim(raw) == raw
    # unknown archive passes through
    other = "https://example.org/web/20180128152127/http://x.com/"
    assert generate_raw_urim(other) == other


def test_goldfile_input(tmp_path):
    p = tmp_path / "gold.tsv"
    p.write_text("1\t20180101\thttp://a.example/\t1\n"
                 "2\t20180102\thttp://b.example/\t0\n")
    from raydedup.sources.goldfile import read_goldstandard

    rows = read_goldstandard(str(p)).take_all()
    assert len(rows) == 2
    assert rows[0]["conv_id"] == "1" and rows[0]["label"] == "1"
    assert rows[1]["text"] == "http://b.example/"


def test_json_and_csv_report_writers(tmp_path):
    """Reference-shape outputs: nested report dict (generate_dict parity),
    CSV column projection (save_as_CSV header parity), JSON-lines dump."""
    import json
    import os

    import pyarrow as pa
    import ray.data

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.pipelines.offtopic import (
        CSV_REPORT_FIELDS,
        csv_report,
        detect_off_topic,
        report_dict,
        save_as_json,
    )

    tbl = pa.table(
        {
            "conv_id": ["c1", "c1", "c2", "c2"],
            "turn_idx": pa.array([0, 1, 0, 1], type=pa.int32()),
            "text": [
                "the original anchor text about topics",
                "a drifted follow-up reply about nothing",
                "second conversation anchor text",
                "second conversation anchor text",  # identical → on-topic
            ],
        }
    )
    measures = ["bytecount", "jaccard"]
    classified = detect_off_topic(
        ray.data.from_arrow(tbl), measures, DEFAULT_CONFIG,
        keep_features=True,
    ).materialize()

    # nested report: reference generate_dict shape
    rep = report_dict(classified, measures, DEFAULT_CONFIG)
    assert set(rep) == {"c1", "c2"}
    assert set(rep["c1"]) == {"c1:0", "c1:1"}
    member = rep["c1"]["c1:1"]
    assert "raw memento simhash value" in member
    assert "content length" in member
    assert set(member["timemap measures"]) == set(measures)
    leaf = member["timemap measures"]["jaccard"]
    assert set(leaf) == {"stemmed", "tokenized", "removed boilerplate",
                         "comparison score", "topic status"}
    assert member["overall topic status"] in ("on-topic", "off-topic")
    json.dumps(rep)  # must be JSON-serializable like the reference's dump

    # CSV report: exact reference fieldnames, one row per memento
    out = csv_report(classified, measures, DEFAULT_CONFIG)
    assert out.schema().names == CSV_REPORT_FIELDS
    rows = out.take_all()
    assert len(rows) == 4
    assert all(r["Measurement Name"] == measures[-1] for r in rows)

    # JSON-lines writer
    jdir = str(tmp_path / "jsonout")
    save_as_json(classified, jdir)
    files = [f for f in os.listdir(jdir) if f.endswith(".json")]
    assert files
    with open(os.path.join(jdir, files[0])) as fh:
        first = json.loads(fh.readline())
    assert "overall_status" in first


def test_sql_stem_lookup_matches_porter_and_covers_testdata_vocab():
    """The near_dup_clusters_transcripts oracle embeds a literal Porter
    lookup (stemming is not ANSI-SQL); this pins it to the real stemmer
    and to the closed testdata vocabulary so drift fails here, not as a
    silent oracle pass-through."""
    import os
    import re

    import duckdb

    from __ray_entry__ import _PORTER_SQL_STEMS
    from raydedup.textnorm import porter_stem

    for word, stem in _PORTER_SQL_STEMS.items():
        assert porter_stem(word) == stem, word

    word_re = re.compile(r"[0-9a-zA-Z_]+")
    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        vocab = {
            tok
            for (text,) in con.sql(f"SELECT text FROM '{path}'").fetchall()
            for tok in word_re.findall(text)
        }
        assert vocab <= set(_PORTER_SQL_STEMS), vocab - set(_PORTER_SQL_STEMS)


def test_jsonl_input_roundtrip(ray_session, tmp_path):
    import json

    import pyarrow as pa

    from raydedup.registry import supported_input_types
    from raydedup.sources.transcripts import generate_transcripts

    tbl = generate_transcripts(n_convs=5, seed=3)
    p = tmp_path / "t.jsonl"
    with open(p, "w") as f:
        for r in tbl.to_pylist():
            r["ts"] = r["ts"].isoformat()  # ISO string path
            f.write(json.dumps(r) + "\n")
    ds = supported_input_types["jsonl"](str(p))
    got = pa.Table.from_pylist(
        sorted(ds.take_all(), key=lambda r: (r["conv_id"], r["turn_idx"])))
    want = pa.Table.from_pylist(
        sorted(tbl.to_pylist(), key=lambda r: (r["conv_id"], r["turn_idx"])))
    assert got["conv_id"] == want["conv_id"]
    assert got["turn_idx"].to_pylist() == want["turn_idx"].to_pylist()
    assert got["text"] == want["text"]
    assert got["ts"].to_pylist() == want["ts"].to_pylist()
    # missing optional columns default to empty strings
    p2 = tmp_path / "t2.jsonl"
    with open(p2, "w") as f:
        f.write(json.dumps({"conv_id": "c", "turn_idx": 0,
                            "text": "hi", "ts": 1_000_000}) + "\n")
    (r,) = supported_input_types["jsonl"](str(p2)).take_all()
    assert r["role"] == "" and r["tool"] == ""
    assert r["ts"].timestamp() == 1.0


def test_entry_module_query_oracle_consistency():
    """Driver-contract invariants: every queries() entry except the
    documented rows-only set carries an oracle; no orphan oracles; the
    rows-only set stays an explicit, minimal list."""
    import __ray_entry__ as em

    qs = set(em.queries())
    oracles = set(em.oracle_sql())
    rows_only = qs - oracles
    # otmt_lda is a deterministic pLSA EM stand-in and kmeans_clusters a
    # Lloyd fixed-point loop — iterative algorithms are not
    # SQL-expressible (both documented in their query docstrings; both
    # pinned by pytest instead)
    assert rows_only == {"otmt_lda", "kmeans_clusters",
                         "remove_dup_spans"}, rows_only
    assert oracles <= qs, oracles - qs
