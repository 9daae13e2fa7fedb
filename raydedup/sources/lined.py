"""Deterministic "lined documents" derivation for line-granularity
operators (``stages/linededup.py``).

The driver's synthetic ``documents`` table is single-line word soup, so
line-level dedup over the raw ``text`` would be vacuous. This module
derives a multi-line view with REAL cross-document duplicate lines:
each document's text is re-segmented into word ``n``-grams (default 3),
one per line, joined by ``\\n``. The small closed testdata vocabulary
makes trigram lines collide across documents naturally (~15% of
distinct lines are multi-doc at sf0.01), which is exactly the
boilerplate-repetition structure the C4/FineWeb line-dedup recipe
targets.

The derivation is expressed twice — vectorized Arrow here, and the
``LINED_SQL`` DuckDB CTE below — so line-granularity queries get full
value-level oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# DuckDB CTE mirroring lined_documents(n=3); prepend to oracle SQL.
LINED_SQL = """
WITH __w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
lined AS (SELECT doc_id,
    list_transform(range(0, CAST(ceil(len(ws) / 3.0) AS INT)),
        i -> array_to_string(ws[3 * i + 1 : 3 * i + 3], ' ')) AS lines
    FROM __w)
"""


def lined_documents(sf_dir: str, n: int = 3):
    """documents.parquet → ``(doc_id, text)`` where ``text`` is the
    document re-segmented into word ``n``-gram lines joined by newlines
    (see LINED_SQL). Fully vectorized: one split per batch, ListArray
    regroup + ``binary_join`` — no per-row Python."""

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=64,
    )

    def relin(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())})
        words = pc.split_pattern(
            pc.fill_null(batch["text"].combine_chunks(), ""), pattern=" ")
        words = (words.combine_chunks()
                 if isinstance(words, pa.ChunkedArray) else words)
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off0 = offs[0]
        offs = offs - off0
        flat = words.values.slice(off0, offs[-1])
        lens = np.diff(offs)
        nlines = -(-lens // n)  # ceil; "" splits to [''] -> one empty line
        tot = int(nlines.sum())
        doc_of_line = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                                nlines)
        first = np.r_[0, np.cumsum(nlines)[:-1]]
        within = np.arange(tot, dtype=np.int64) - first[doc_of_line]
        starts = offs[:-1][doc_of_line] + n * within
        line_offs = np.r_[starts, offs[-1]].astype(np.int32)
        lines_flat = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(line_offs, pa.int32()), flat),
            pa.scalar(" "))
        doc_offs = np.r_[0, np.cumsum(nlines)].astype(np.int32)
        text2 = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(doc_offs, pa.int32()),
                                     lines_flat),
            pa.scalar("\n"))
        return pa.table({"doc_id": batch["doc_id"], "text": text2})

    return docs.map_batches(relin, batch_format="pyarrow")
