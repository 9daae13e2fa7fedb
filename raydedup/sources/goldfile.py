"""Gold-standard TSV input — parity with the reference's "goldtest"
input type (``get_collection_model_from_datafile``,
otmt/input_types.py:580-636): a ``(id, date, URI, label)`` TSV becomes a
transcript-shaped Dataset where each row is one turn of a synthetic
conversation keyed by the id column (≡ the synthetic one-memento TimeMaps
the reference builds).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data


def read_goldstandard(path: str):
    """TSV (id, date, URI, label) → Dataset(conv_id, turn_idx, role, text,
    tool, ts, label)."""
    tbl = pacsv.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter="\t"),
        read_options=pacsv.ReadOptions(
            column_names=["id", "date", "URI", "label"]
        ),
        convert_options=pacsv.ConvertOptions(
            column_types={"id": pa.string(), "date": pa.string(),
                          "URI": pa.string(), "label": pa.string()}
        ),
    )
    n = tbl.num_rows
    out = pa.table(
        {
            "conv_id": tbl["id"],
            "turn_idx": pa.array([0] * n, type=pa.int32()),
            "role": pa.array(["user"] * n, type=pa.string()),
            "text": tbl["URI"],
            "tool": pa.array([""] * n, type=pa.string()),
            "ts": pa.array([0] * n, type=pa.timestamp("us")),
            "label": tbl["label"],
        }
    )
    return ray.data.from_arrow(out)
