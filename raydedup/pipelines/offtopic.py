"""Off-topic detection pipeline — the reference's primary CLI
``detect_off_topic`` (bin/detect_off_topic, SURVEY §3.1) as one Dataset DAG.

Reference 4-phase lifecycle → engine stages:
  1. Acquire  → read_parquet / transcripts_from_documents
  2. Measure  → anchor_measures (prep map_batches + per-conv map_groups)
               + classify_offtopic thresholds
  3. Extra calculations → simhash / content length / language columns
     (computed in the same prep pass — no full re-scans like the
     reference's phase 3, otmt/metadata_calcluations.py)
  4. Output  → write_parquet / write_csv / topic list files
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DedupConfig, DEFAULT_CONFIG
from raydedup.stages.exact import add_row_key
from raydedup.stages.measures import ALL_MEASURES, anchor_measures
from raydedup.stages.threshold import classify_offtopic


def detect_off_topic(ds, measures: list[str] | None = None,
                     cfg: DedupConfig = DEFAULT_CONFIG,
                     key_cols: list[str] | None = None,
                     keep_features: bool = False):
    """transcripts → per-row measure scores + statuses + overall_status.
    ``keep_features=True`` additionally carries content_length +
    memento_simhash (needed by the reference-shape report writers)."""
    measures = measures or ALL_MEASURES
    key_cols = key_cols or ["conv_id", "turn_idx"]
    keyed = add_row_key(ds, key_cols)
    scored = anchor_measures(keyed, measures, cfg, keep_features=keep_features)
    return classify_offtopic(scored, measures, cfg)


def topic_lists(classified_ds):
    """(off_topic_ds, on_topic_ds) single-key outputs ≡ the reference's
    off-topic / on-topic URI list files (bin/detect_off_topic:275-293)."""
    off = classified_ds.filter(expr="overall_status == 'off-topic'")
    on = classified_ds.filter(expr="overall_status == 'on-topic'")
    return off.select_columns(["row_key"]), on.select_columns(["row_key"])


def save_as_goldstandard(classified_ds, path: str):
    """TSV-ish gold standard table (id, date, URI, label) ≡
    save_as_goldstandard (otmt/measuremodel.py:606-672): label 1 =
    on-topic, 0 = off-topic. Written as CSV for parity of shape."""

    def project(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        label = pc.if_else(
            pc.equal(batch["overall_status"], pa.scalar("on-topic")),
            pa.scalar("1"), pa.scalar("0"),
        )
        return pa.table(
            {
                "id": pa.array(range(n), type=pa.int64()),
                "date": pc.cast(batch["turn_idx"], pa.string()),
                "URI": batch["row_key"],
                "label": label,
            }
        )

    classified_ds.map_batches(project, batch_format="pyarrow").write_csv(path)


def save_as_json(classified_ds, path: str):
    """Flat JSON-lines dump of the classified table — the engine-native
    equivalent of the reference's primary output
    (otmt/output_types.py:23-27 'json'; flat rows instead of the nested
    driver dict so the write streams and shards). Use ``report_dict`` for
    the reference's exact nested small-report shape."""
    classified_ds.write_json(path)


def report_dict(classified_ds, measures: list[str],
                cfg: DedupConfig = DEFAULT_CONFIG) -> dict:
    """The reference's nested report (otmt/measuremodel.py:532-596
    ``generate_dict``): {URI-T: {URI-M: {"raw memento simhash value",
    "content length", "timemap measures": {measure: {stemmed, tokenized,
    removed boilerplate, comparison score, topic status}},
    "overall topic status"}}}. URI-T = conv_id, URI-M = row_key.

    Driver-side by design: this is the SMALL human-readable report (the
    reference json.dumps's it whole); large outputs go through
    save_as_json/write_parquet instead.
    """
    out: dict = {}
    for b in classified_ds.iter_batches(batch_size=4096,
                                        batch_format="pyarrow"):
        d = b.to_pylist()
        for row in d:
            urit = row["conv_id"]
            urim = row["row_key"]
            entry = out.setdefault(str(urit), {}).setdefault(urim, {})
            # presence test, not truthiness: a legitimate 0 value (empty
            # text → content_length 0, simhash 0) must still be reported
            if row.get("memento_simhash") is not None:
                entry["raw memento simhash value"] = int(row["memento_simhash"])
            if row.get("content_length") is not None:
                entry["content length"] = int(row["content_length"])
            mm = entry.setdefault("timemap measures", {})
            for m in measures:
                err = row.get(m + "_error")
                if err:
                    mm[m] = {"measurement error": str(err)}
                else:
                    mm[m] = {
                        "stemmed": cfg.stemming,
                        "tokenized": True,
                        "removed boilerplate": False,
                        "comparison score": row[m],
                        "topic status": row[m + "_status"],
                    }
                    entry["overall topic status"] = row["overall_status"]
    return out


# exact reference CSV header (otmt/measuremodel.py:729-742)
CSV_REPORT_FIELDS = [
    "URI-T", "URI-M", "Error", "Error Message", "Content Length", "Simhash",
    "Measurement Type", "Measurement Name", "Comparison Score",
    "Stemmed", "Tokenized", "Removed Boilerplate", "Topic Status",
    "Overall Topic Status",
]


def csv_report(classified_ds, measures: list[str],
               cfg: DedupConfig = DEFAULT_CONFIG):
    """Reference-parity CSV projection (otmt/measuremodel.py:674-742
    ``save_as_CSV``): ONE row per memento whose measure columns hold the
    LAST measure's values (the reference mutates one dict across its
    measure loop and appends once — faithful quirk), Error columns sticky
    across the loop like the reference's never-cleared keys."""

    def project(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        cols: dict[str, list] = {f: [] for f in CSV_REPORT_FIELDS}
        for row in rows:
            err, err_msg = None, None
            mtype, mname, score = None, None, None
            stemmed = tokenized = boiler = status = overall = None
            for m in measures:
                mtype, mname = "timemap measures", m
                m_err = row.get(m + "_error")
                if m_err:
                    err, err_msg = "Memento Measurement Error", str(m_err)
                else:
                    score = row[m]
                    stemmed, tokenized, boiler = cfg.stemming, True, False
                    status = row[m + "_status"]
                    overall = row["overall_status"]
            cols["URI-T"].append(str(row["conv_id"]))
            cols["URI-M"].append(row["row_key"])
            cols["Error"].append(err)
            cols["Error Message"].append(err_msg)
            cols["Content Length"].append(row.get("content_length"))
            cols["Simhash"].append(row.get("memento_simhash"))
            cols["Measurement Type"].append(mtype)
            cols["Measurement Name"].append(mname)
            cols["Comparison Score"].append(score)
            cols["Stemmed"].append(stemmed)
            cols["Tokenized"].append(tokenized)
            cols["Removed Boilerplate"].append(boiler)
            cols["Topic Status"].append(status)
            cols["Overall Topic Status"].append(overall)
        types = {
            "Content Length": pa.int64(), "Simhash": pa.uint64(),
            "Comparison Score": pa.float64(),
            "Stemmed": pa.bool_(), "Tokenized": pa.bool_(),
            "Removed Boilerplate": pa.bool_(),
        }
        return pa.table(
            {f: pa.array(cols[f], type=types.get(f, pa.string()))
             for f in CSV_REPORT_FIELDS}
        )

    return classified_ds.map_batches(project, batch_format="pyarrow")


def save_as_csv_report(classified_ds, path: str, measures: list[str],
                       cfg: DedupConfig = DEFAULT_CONFIG):
    csv_report(classified_ds, measures, cfg).write_csv(path)
