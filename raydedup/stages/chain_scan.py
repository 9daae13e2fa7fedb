"""Sequential simhash chain-scan suppression — reference parity for
``bin/exclude_duplicates:46-111``.

Reference semantics reproduced exactly (SURVEY §2.10 / §7.5):

- groups are scanned IN ORDER (reference: JSON insertion order; engine:
  ``turn_idx`` ascending within ``conv_id`` — the stable-turn-ordering
  contract);
- state per group: ``prior_simhashes`` seen-list, ``previous_simhash``
  initialized to 0 (so the first row is compared against Simhash(0)) ;
- no-consideration mode: EVERY row is compared and updates state (the
  seen-list membership test does not exist on this path — faithful quirk);
  row kept as a non-duplicate iff hamming(cur, prev)/64 > threshold;
- consideration mode: rows not in the consideration set are skipped
  WITHOUT updating state; considered rows whose simhash was already seen
  are skipped (not kept, no state update).

The scan is inherently sequential per conversation but O(group) and groups
are small (conversations), so a ``groupby(conv_id).map_groups`` with an
in-task sort is the right distribution: one task per conversation bundle,
all conversations in parallel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from raydedup.functions.simhash import hamming_distance


def _scan_group(simhashes: list[int], keys: list[str],
                threshold: float,
                consider: set[str] | None) -> list[str]:
    kept: list[str] = []
    prior: list[int] = []
    previous = 0
    for sh, key in zip(simhashes, keys):
        if consider is not None:
            if key not in consider:
                continue
            if sh in prior:
                continue
            prior.append(sh)
            if hamming_distance(sh, previous) / 64 > threshold:
                kept.append(key)
            previous = sh
        else:
            prior.append(sh)
            if hamming_distance(sh, previous) / 64 > threshold:
                kept.append(key)
            previous = sh
    return kept


def chain_scan_survivors(sigs_ds, threshold: float = 0.2,
                         consideration_keys: set[str] | None = None,
                         group_col: str = "conv_id",
                         order_col: str = "turn_idx"):
    """signatures (with row_key, simhash) → Dataset(row_key) of
    non-duplicates, reference chain-scan semantics per group."""
    consider_ref = ray.put(consideration_keys)
    # shuffle only the four needed skinny columns — the signature payload
    # (shingle hash lists, band vectors) must not cross this groupby
    sigs_ds = sigs_ds.select_columns(
        [group_col, order_col, "row_key", "simhash"]
    )

    def scan(group: pa.Table) -> pa.Table:
        order = np.argsort(group[order_col].to_numpy(), kind="stable")
        key_arr = group["row_key"].take(pa.array(order)).combine_chunks()
        shs_np = group["simhash"].to_numpy(zero_copy_only=False)[order]
        consider = ray.get(consider_ref)
        if consider is None:
            # every row updates state ⇒ prev is just the shifted column;
            # hamming(cur, prev) vectorizes as a popcount of the xor
            prev = np.r_[np.zeros(1, dtype=np.uint64), shs_np[:-1]]
            x = (shs_np ^ prev).view(np.uint8)
            ham = np.unpackbits(x).reshape(-1, 64).sum(axis=1)
            keep = ham / 64 > threshold
            return pa.table({"row_key": key_arr.filter(pa.array(keep))})
        keys = key_arr.to_pylist()
        kept = _scan_group([int(s) for s in shs_np], keys, threshold,
                           consider)
        return pa.table({"row_key": pa.array(kept, type=pa.string())})

    return sigs_ds.groupby(group_col).map_groups(scan, batch_format="pyarrow")
