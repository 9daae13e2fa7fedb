"""Storytelling-chain selection operators — reference parity for
``bin/select_high_quality`` and ``bin/select_by_language``.

- URI category score: regex hostname classes with fixed weights
  (bin/select_high_quality:44-79);
- URI depth score: path-slash count / 10 (bin/select_high_quality:81-90);
- memento damage: an external REST call in the reference
  (bin/select_high_quality:92-120) — stubbed to 0.0 here (no network in
  this engine; the actor signature is kept so a real client slots in);
- combined quality = -0.40*damage + 0.15*category + 0.45*depth
  (bin/select_high_quality:122-133);
- per-(slice, cluster) top-1 selection (bin/select_high_quality:156-170);
- language filter (bin/select_by_language:58-74).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_CATEGORY_PATTERNS: list[tuple[str, float]] = [
    # (hostname regex, weight) — same classes/weights as the reference
    (r"(twitter|facebook|instagram|t\.co)", 1.0),      # social
    (r"(youtube|youtu\.be|vimeo)", 0.9),               # video
    (r"(flickr|photobucket)", 0.8),                    # photo
    (r"(blogspot|wordpress|blogger)", 0.5),            # blog
    (r"(cnn|bbc|reuters|nytimes|news)", 0.3),          # news
]


def uri_scores(ds, uri_col: str = "uri", damage_fn=None,
               damage_col: str | None = None):
    """→ adds category_score, depth_score, damage_score, quality_score.

    ``damage_fn``: optional ``list[str] -> array-like of float`` scoring
    memento damage per URI — the injection point for the reference's REST
    client (bin/select_high_quality:92-120). Must be a deterministic
    serializable callable (it ships to workers). Default: 0.0 per row.
    ``damage_col``: alternatively, the name of an existing damage column
    (produced upstream by the :class:`DamageClient` actor-pool stage);
    mutually exclusive with ``damage_fn``."""
    if damage_fn is not None and damage_col is not None:
        raise ValueError("pass damage_fn or damage_col, not both")
    compiled = [(re.compile(p), w) for p, w in _CATEGORY_PATTERNS]

    def score(batch: pa.Table) -> pa.Table:
        uris = ["" if u is None else u for u in batch[uri_col].to_pylist()]
        cat = np.zeros(len(uris))
        for i, u in enumerate(uris):
            host = u.split("//", 1)[-1].split("/", 1)[0].lower()
            for rx, w in compiled:
                if rx.search(host):
                    cat[i] = w
                    break
        path = [u.split("//", 1)[-1] for u in uris]
        depth = np.array([p.count("/") for p in path], dtype=np.float64) / 10.0
        if damage_col is not None:
            damage = pc.fill_null(batch[damage_col], 0.0).to_numpy(
                zero_copy_only=False).astype(np.float64)
        elif damage_fn is None:
            damage = np.zeros(len(uris))
        else:
            damage = np.asarray(damage_fn(uris), dtype=np.float64)
        quality = -0.40 * damage + 0.15 * cat + 0.45 * depth
        out = {n: batch[n] for n in batch.column_names
               if n != damage_col}
        out["category_score"] = pa.array(cat)
        out["depth_score"] = pa.array(depth)
        out["damage_score"] = pa.array(damage)
        out["quality_score"] = pa.array(quality)
        return pa.table(out)

    return ds.map_batches(score, batch_format="pyarrow")


def select_high_quality(scored_ds, group_cols=("slice_number", "cluster_id"),
                        quality_col: str = "quality_score",
                        key_col: str = "row_key"):
    """Top-1 by quality per (slice, cluster) — grouped arg-max with the
    reference's sort-desc-take-first tie-break (sorted() on score only is
    stable in Python, so the FIRST max in iteration order wins; we pin the
    deterministic equivalent: max score, ties broken by min key)."""

    def top1(g: pa.Table) -> pa.Table:
        q = g[quality_col].to_numpy(zero_copy_only=False)
        # NaN-safe max (an injected damage_fn can produce NaN scores):
        # the best NON-NaN row wins, matching the replaced pandas
        # sort_values(...).head(1); an all-NaN group keeps its first row
        finite = ~np.isnan(q)
        if finite.any():
            best = q[finite].max()
            cand = np.flatnonzero(finite & (q == best))
        else:
            cand = np.array([0], dtype=np.int64)
        if cand.size > 1:  # ties: min key wins (few rows, keys are strings)
            keys = g[key_col].take(pa.array(cand)).to_pylist()
            cand = cand[[min(range(len(keys)), key=keys.__getitem__)]]
        return g.take(pa.array(cand[:1]))

    return scored_ds.groupby(list(group_cols)).map_groups(
        top1, batch_format="pyarrow"
    )


def select_by_language(ds, lang: str, lang_col: str = "detected_lang"):
    """Keep rows whose detected language equals ``lang``
    (bin/select_by_language:58-74)."""
    return ds.filter(expr=f"{lang_col} == {lang!r}")


class DamageClient:
    """Rate-limited memento-damage scoring stage — the reference's REST
    client (bin/select_high_quality:92-120: GET
    ``{damage_uri}/api/damage/{urim}``, read ``total_damage`` from the
    JSON body, ANY failure scores 0) re-expressed as a stateful Ray
    actor-pool stage::

        scored = ds.map_batches(
            DamageClient, fn_constructor_kwargs=dict(
                damage_uri="http://damage.svc", transport=requests_get),
            concurrency=8, batch_size=256, batch_format="pyarrow")
        quality = uri_scores(scored, damage_col="damage_score")

    Per-actor state (built once in ``__init__``, shared across batches):

    - ``transport``: ``url -> dict`` — the one network-touching hook.
      This sandbox has no network, so there is NO default transport;
      production injects a requests-based one, tests a deterministic
      fake. ``damage_uri=None`` short-circuits to 0.0 per row without
      calling it (reference line 93-94).
    - token-bucket rate limit: each actor spaces calls ``1/max_qps``
      seconds apart (``clock``/``sleep`` injectable for tests) so a
      pool of N actors holds the service at ≤ N·max_qps — the REST
      endpoint, not Ray, is the bottleneck being protected.
    - bounded retries with exponential backoff
      (``backoff · 2^attempt``); exhausted retries and malformed
      bodies score 0.0 like the reference.
    - per-URI LRU cache (dedup within a partition's URI stream —
      mementos repeat across slices).
    """

    def __init__(self, damage_uri: str | None = None, transport=None,
                 max_qps: float = 8.0, retries: int = 2,
                 backoff: float = 0.5, cache_size: int = 65536,
                 uri_col: str = "uri", out_col: str = "damage_score",
                 clock=None, sleep=None):
        import time
        from collections import OrderedDict

        if damage_uri is not None and transport is None:
            raise ValueError(
                "DamageClient needs a transport when damage_uri is set "
                "(no network in this environment; inject one)")
        self.base = (damage_uri.rstrip("/")
                     if damage_uri is not None else None)
        self.transport = transport
        self.min_interval = 1.0 / max_qps if max_qps > 0 else 0.0
        self.retries = retries
        self.backoff = backoff
        self.uri_col = uri_col
        self.out_col = out_col
        self.clock = clock or time.monotonic
        self.sleep = sleep or time.sleep
        self.cache: OrderedDict[str, float] = OrderedDict()
        self.cache_size = cache_size
        self._last = float("-inf")
        self.calls = 0

    def _fetch(self, urim: str) -> float:
        for attempt in range(self.retries + 1):
            wait = self._last + self.min_interval - self.clock()
            if wait > 0:
                self.sleep(wait)
            self._last = self.clock()
            self.calls += 1
            try:
                body = self.transport(f"{self.base}/api/damage/{urim}")
                return float(body.get("total_damage", 0.0))
            except Exception:
                if attempt < self.retries:
                    self.sleep(self.backoff * (2 ** attempt))
        return 0.0

    def score(self, urim: str) -> float:
        if not urim or self.base is None:
            return 0.0
        hit = self.cache.get(urim)
        if hit is not None:
            self.cache.move_to_end(urim)
            return hit
        v = self._fetch(urim)
        self.cache[urim] = v
        if len(self.cache) > self.cache_size:
            self.cache.popitem(last=False)
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        uris = batch[self.uri_col].to_pylist()
        out = {n: batch[n] for n in batch.column_names}
        out[self.out_col] = pa.array(
            [self.score(u) for u in uris], pa.float64())
        return pa.table(out)
