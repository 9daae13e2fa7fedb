"""Off-topic classification — reference parity for
``otmt/measuremodel.py:456-530``.

Per measure: ``score <direction> threshold → "off-topic" else "on-topic"``
with the direction/threshold registry from the reference
(raydedup.config.DEFAULT_THRESHOLDS); rows whose measure errored keep a
null status (the reference skips rows with access/measurement errors,
measuremodel.py:468-480). Overall: a row is off-topic if ANY computed
measure flagged it (first-off-topic-wins loop, measuremodel.py:504-530);
rows with no scorable measure stay "on-topic" like the reference's
default.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from raydedup.config import DedupConfig, DEFAULT_CONFIG

_OPS = {
    "<": pc.less,
    ">": pc.greater,
    "==": pc.equal,
    "!=": pc.not_equal,
}


def classify_offtopic(scores_ds, measures: list[str],
                      cfg: DedupConfig = DEFAULT_CONFIG):
    """measure-score table → adds ``{measure}_status`` per measure and
    ``overall_status`` ('on-topic' / 'off-topic'). Vectorized pc kernels,
    no shuffle."""
    thresholds = cfg.thresholds

    def classify(batch: pa.Table) -> pa.Table:
        overall_off = pa.array([False] * batch.num_rows, type=pa.bool_())
        for m in measures:
            direction, thr = thresholds[m]
            score = batch[m]
            is_off = _OPS[direction](score, pa.scalar(float(thr)))
            status = pc.if_else(
                pc.is_valid(score),
                pc.if_else(is_off, pa.scalar("off-topic"), pa.scalar("on-topic")),
                pa.scalar(None, type=pa.string()),
            )
            batch = batch.append_column(m + "_status", status)
            overall_off = pc.or_kleene(
                overall_off, pc.coalesce(is_off, pa.scalar(False))
            )
        return batch.append_column(
            "overall_status",
            pc.if_else(overall_off, pa.scalar("off-topic"), pa.scalar("on-topic")),
        )

    return scores_ds.map_batches(classify, batch_format="pyarrow")
