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
    assert {"parquet", "csv", "goldstandard"} <= set(supported_output_types)


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
