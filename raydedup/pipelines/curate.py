"""End-to-end curation recipe — the composition a pretraining-data run
ships (Gopher-rule filters → tiered dedup cascade → LM quality score;
public recipe shape per Rae et al. 2021 §A1.1 quality rules, RefinedWeb/
FineWeb dedup ordering, CCNet LM scoring):

1. FILTER (integer-exact Gopher-style rules, one streaming pass, no
   shuffle): token count within [len_lo, len_hi] and the most frequent
   token below 1/rep_mult of the doc (``max_tf * rep_mult <= n_words``).
   Integer comparisons keep the composition bit-identical to SQL — a
   float ratio filter can flip on the boundary ulp.
2. DEDUP: the three-tier cascade (exact sha → near prefix-filter
   Jaccard → SemDeDup cosine over tier-2 survivors) on the filtered
   corpus; only ``tier == 'keep'`` survivors continue.
3. SCORE: unigram log-perplexity under the FILTERED corpus's own LM
   (the CCNet ordering — the LM sees the quality-filtered distribution,
   not the raw one), attached to each survivor.

Output: one row per surviving doc ``(id, n_words, max_tf, logppl)``.

Scale shape: stage 1 is map-only (token stats computed per batch — a
doc never leaves its batch); stage 2 inherits the cascade's auto-switch
distributed paths; stage 3 joins two id-keyed Datasets (ints only — the
text never crosses a join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from raydedup.config import DedupConfig, DEFAULT_CONFIG
from raydedup.stages.textstats import _doc_term_codes, unigram_logppl
from raydedup.util import join_partitions


def doc_token_stats(ds, id_col: str = "doc_id", text_col: str = "text",
                    keep_text: bool = True):
    """docs → ``(id, [text], n_words, max_tf)`` — total token count and
    the highest single-token frequency per doc, in ONE streaming pass
    (lexsort + run-length per batch; no shuffle). Zero-token docs get
    ``(0, 0)``."""

    def stats(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {id_col: batch[id_col]}
        if keep_text:
            cols[text_col] = batch[text_col]
        if n == 0:
            cols["n_words"] = pa.array([], pa.int64())
            cols["max_tf"] = pa.array([], pa.int64())
            return pa.table(cols)
        docidx, codes, _ = _doc_term_codes(batch, text_col)
        n_words = np.bincount(docidx, minlength=n).astype(np.int64)
        max_tf = np.zeros(n, dtype=np.int64)
        if len(codes):
            order = np.lexsort((codes, docidx))
            dc, cc = docidx[order], codes[order]
            first = np.r_[True, (dc[1:] != dc[:-1]) | (cc[1:] != cc[:-1])]
            starts = np.flatnonzero(first)
            tf = np.diff(np.r_[starts, len(cc)]).astype(np.int64)
            np.maximum.at(max_tf, dc[starts], tf)
        cols["n_words"] = pa.array(n_words)
        cols["max_tf"] = pa.array(max_tf)
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow")


def curate_docs(docs, emb, len_lo: int = 25, len_hi: int = 90,
                rep_mult: int = 5, threshold: float = 0.5,
                sem_threshold: float = 0.35,
                cfg: DedupConfig = DEFAULT_CONFIG,
                id_col: str = "doc_id", text_col: str = "text",
                emb_id_col: str = "vec_id", vec_col: str = "embedding",
                num_partitions: int | None = None):
    """Filter → tiered-semantic dedup → LM-score. See module docstring.

    Returns ``(id, n_words, max_tf, logppl)`` for every doc that passes
    the rules AND survives all three dedup tiers; ``logppl`` is scored
    under the filtered (pre-dedup) corpus LM at full float precision.
    """
    from raydedup.pipelines.tiered import tiered_dedup_semantic

    stats = doc_token_stats(docs, id_col, text_col).materialize()

    def rules(batch: pa.Table) -> pa.Table:
        nw = batch["n_words"]
        keep = pc.and_(
            pc.and_(pc.greater_equal(nw, pa.scalar(int(len_lo))),
                    pc.less_equal(nw, pa.scalar(int(len_hi)))),
            pc.less_equal(pc.multiply(batch["max_tf"],
                                      pa.scalar(int(rep_mult),
                                                pa.int64())), nw))
        return batch.filter(keep)

    qdocs = stats.map_batches(rules, batch_format="pyarrow").materialize()
    id_type = pa.int64()
    sch = qdocs.schema()
    if sch is not None and id_col in sch.names:
        id_type = dict(zip(sch.names, sch.types))[id_col]
    out_schema = pa.schema([
        pa.field(id_col, id_type), pa.field("n_words", pa.int64()),
        pa.field("max_tf", pa.int64()), pa.field("logppl", pa.float64()),
    ])
    if qdocs.count() == 0:
        return ray.data.from_arrow(out_schema.empty_table())

    tiers = tiered_dedup_semantic(
        qdocs.select_columns([id_col, text_col]), emb,
        threshold=threshold, sem_threshold=sem_threshold, cfg=cfg,
        id_col=id_col, text_col=text_col, emb_id_col=emb_id_col,
        vec_col=vec_col, num_partitions=num_partitions)

    def surv_rows(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["tier"], pa.scalar("keep"))
        return pa.table({id_col: batch.filter(keep)[id_col]})

    surv = tiers.map_batches(surv_rows, batch_format="pyarrow")
    ppl = unigram_logppl(qdocs.select_columns([id_col, text_col]),
                         id_col=id_col, text_col=text_col,
                         num_partitions=num_partitions)

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_parts = num_partitions or min(join_partitions(max(surv.count(), 1)),
                                    max(2, 2 * ncpu))
    out = (surv.join(stats.select_columns([id_col, "n_words", "max_tf"]),
                     join_type="inner", num_partitions=n_parts,
                     on=(id_col,))
           .join(ppl.select_columns([id_col, "logppl"]),
                 join_type="inner", num_partitions=n_parts,
                 on=(id_col,)))
    return out.union(ray.data.from_arrow(out_schema.empty_table()))
