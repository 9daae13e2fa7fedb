"""Chain-scan suppression parity vs an inline re-statement of the
reference loop (bin/exclude_duplicates:67-106)."""

import numpy as np
import pyarrow as pa

import ray.data

from raydedup.config import DEFAULT_CONFIG
from raydedup.pipelines.neardup import signatures_with_rep
from raydedup.sources.transcripts import generate_transcripts
from raydedup.stages.chain_scan import _scan_group, chain_scan_survivors
from raydedup.functions.simhash import hamming_distance


def reference_scan(groups: dict[str, list[tuple[str, int]]],
                   threshold: float = 0.2,
                   consider: set[str] | None = None) -> list[str]:
    """Literal restatement of the reference semantics for the oracle."""
    kept = []
    for _, rows in groups.items():
        prior, previous = [], 0
        for key, sh in rows:
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


def _group_fixture():
    rng = np.random.default_rng(5)
    groups = {}
    for c in range(20):
        rows = []
        sh = int(rng.integers(0, 2**63))
        for t in range(int(rng.integers(1, 15))):
            if rng.random() < 0.4:
                # mutate few bits → duplicate-ish
                for _ in range(int(rng.integers(0, 6))):
                    sh ^= 1 << int(rng.integers(0, 64))
            else:
                sh = int(rng.integers(0, 2**63))
            rows.append((f"c{c:02d}:{t}", sh))
        groups[f"c{c:02d}"] = rows
    return groups


def _to_ds(groups):
    conv, turn, keys, shs = [], [], [], []
    for c, rows in groups.items():
        for key, sh in rows:
            conv.append(c)
            turn.append(int(key.split(":")[1]))
            keys.append(key)
            shs.append(sh)
    return ray.data.from_arrow(
        pa.table(
            {
                "conv_id": conv,
                "turn_idx": pa.array(turn, type=pa.int32()),
                "row_key": keys,
                "simhash": pa.array(shs, type=pa.uint64()),
            }
        )
    )


def test_chain_scan_matches_reference_loop():
    groups = _group_fixture()
    got = {r["row_key"] for r in chain_scan_survivors(_to_ds(groups)).take_all()}
    assert got == set(reference_scan(groups))


def test_chain_scan_consideration_mode():
    groups = _group_fixture()
    consider = {k for rows in groups.values() for k, _ in rows
                if int(k.split(":")[1]) % 2 == 0}
    got = {
        r["row_key"]
        for r in chain_scan_survivors(
            _to_ds(groups), consideration_keys=consider
        ).take_all()
    }
    assert got == set(reference_scan(groups, consider=consider))


def test_chain_scan_first_row_vs_simhash_zero():
    # first row compared against Simhash(0): a simhash with ≤ 12 bits set
    # is 'duplicate of nothing' and suppressed (faithful quirk)
    ds = _to_ds({"c": [("c:0", 0b111)]})
    assert chain_scan_survivors(ds).count() == 0
    ds2 = _to_ds({"c": [("c:0", (1 << 40) - 1)]})  # 40 bits set > 12.8
    assert {r["row_key"] for r in chain_scan_survivors(ds2).take_all()} == {"c:0"}


def test_chain_scan_on_generated_corpus():
    tbl = generate_transcripts(n_convs=30, seed=1)
    assigned = signatures_with_rep(ray.data.from_arrow(tbl), DEFAULT_CONFIG)
    rows = assigned.take_all()
    groups: dict[str, list[tuple[str, int]]] = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        groups.setdefault(r["conv_id"], []).append((r["row_key"], r["simhash"]))
    ds = _to_ds(groups)
    got = {r["row_key"] for r in chain_scan_survivors(ds).take_all()}
    assert got == set(reference_scan(groups))
