"""User-extension registries — parity with the reference's extension
surface (SURVEY §2.11):

- ``supported_timemap_measures`` (otmt/timemap_measures.py:895-970):
  name → {function, comparison direction, default threshold}. Functions
  share one signature ``fn(ds, cfg) -> Dataset`` so a factory/driver can
  iterate them, exactly like the reference's ``compute_*`` family.
- ``supported_collection_measures`` (otmt/collection_measures.py:195-214)
- ``supported_input_types`` (otmt/input_types.py:647-653)
- ``supported_output_types`` (otmt/output_types.py:23-27)

Extending the engine = inserting into these dicts (or passing a custom
``DedupConfig.thresholds``), mirroring how the reference invites
subclass/registry extension.
"""

from __future__ import annotations

from raydedup.config import DEFAULT_CONFIG, DEFAULT_THRESHOLDS, DedupConfig


def _measure_fn(name: str):
    def run(ds, cfg: DedupConfig = DEFAULT_CONFIG):
        from raydedup.stages.measures import anchor_measures

        return anchor_measures(ds, [name], cfg)

    run.__name__ = f"compute_{name}_across_conversations"
    return run


supported_timemap_measures = {
    name: {
        "name": name,
        "function": _measure_fn(name),
        "comparison direction": DEFAULT_THRESHOLDS[name][0],
        "default threshold": DEFAULT_THRESHOLDS[name][1],
    }
    for name in (
        "bytecount", "wordcount", "jaccard", "sorensen", "levenshtein",
        "nlevenshtein", "tfintersection", "raw_simhash", "tf_simhash",
        "cosine", "gensim_lsi", "gensim_lda",
    )
}


def _collection_fn(simple_tokens: bool):
    def run(ds, key_cols=("conv_id", "turn_idx")):
        from raydedup.stages.collection import collection_measures

        return collection_measures(ds, list(key_cols),
                                   simple_tokens=simple_tokens)

    return run


supported_collection_measures = {
    "collection_jaccard": {
        "function": _collection_fn(False),
        "comparison direction": DEFAULT_THRESHOLDS["collection_jaccard"][0],
        "default threshold": DEFAULT_THRESHOLDS["collection_jaccard"][1],
    },
    "collection_sorensen": {
        "function": _collection_fn(False),
        "comparison direction": DEFAULT_THRESHOLDS["collection_sorensen"][0],
        "default threshold": DEFAULT_THRESHOLDS["collection_sorensen"][1],
    },
}


def _input_parquet(path: str):
    from raydedup.sources.transcripts import read_transcripts

    return read_transcripts(path)


def _input_documents(sf_dir: str):
    from raydedup.sources.transcripts import transcripts_from_documents

    return transcripts_from_documents(sf_dir)


def _input_goldfile(path: str):
    from raydedup.sources.goldfile import read_goldstandard

    return read_goldstandard(path)


def _input_jsonl(path: str):
    from raydedup.sources.transcripts import read_transcripts_jsonl

    return read_transcripts_jsonl(path)


supported_input_types = {
    "parquet": _input_parquet,     # ≡ warc/timemap ingest (engine-native)
    "jsonl": _input_jsonl,          # engine addition: jsonl shards
    "documents": _input_documents,  # ≡ archiveit collection id
    "goldtest": _input_goldfile,    # ≡ gold-standard TSV datafile
    # ≡ "dir" resume input: CheckpointedRun re-opens a run directory
}


def _output_parquet(path: str, ds):
    ds.write_parquet(path)


def _output_json(path: str, ds):
    from raydedup.pipelines.offtopic import save_as_json

    save_as_json(ds, path)


def _output_csv(path: str, ds):
    ds.write_csv(path)


def _output_csv_report(path: str, classified_ds, measures=None,
                       cfg: DedupConfig = DEFAULT_CONFIG):
    from raydedup.pipelines.offtopic import save_as_csv_report
    from raydedup.stages.measures import ALL_MEASURES

    if measures is None:
        # derive the measure list from the dataset itself: classified
        # datasets carry one <m>_status column per computed measure, so
        # the generic two-arg registry call works on any measure subset
        # (a fixed ALL_MEASURES default raised KeyError on datasets
        # classified with fewer measures)
        names = set(classified_ds.schema().names)
        measures = [m for m in ALL_MEASURES if f"{m}_status" in names]
    save_as_csv_report(classified_ds, path, measures, cfg)


def _output_goldstandard(path: str, classified_ds):
    from raydedup.pipelines.offtopic import save_as_goldstandard

    save_as_goldstandard(classified_ds, path)


# reference registry: {'json', 'golddatafile', 'csv'}
# (otmt/output_types.py:23-27); parquet is the engine-native addition
supported_output_types = {
    "parquet": _output_parquet,
    "json": _output_json,              # ≡ save_as_JSON (primary output)
    "csv": _output_csv,
    "csv_report": _output_csv_report,  # ≡ save_as_CSV column projection
    "golddatafile": _output_goldstandard,
    "goldstandard": _output_goldstandard,  # back-compat alias
}
