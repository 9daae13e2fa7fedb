"""Conversation-structure dedup: prefix containment + tool-sequence
clusters (stages/convdedup.py) against planted fixtures and a
brute-force oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from raydedup.stages.convdedup import (_B, _BINV, conv_prefix_hashes,
                                       prefix_containment_pairs,
                                       tool_sequence_clusters)


def _ts_table(convs: dict[str, list[tuple[str, str, str]]]) -> pa.Table:
    """convs: conv_id -> [(role, text, tool), ...] in turn order."""
    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": [],
            "tool": []}
    for cid, turns in convs.items():
        for i, (role, text, tool) in enumerate(turns):
            rows["conv_id"].append(cid)
            rows["turn_idx"].append(i)
            rows["role"].append(role)
            rows["text"].append(text)
            rows["tool"].append(tool)
    return pa.table({
        "conv_id": pa.array(rows["conv_id"], pa.string()),
        "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
        "role": pa.array(rows["role"], pa.string()),
        "text": pa.array(rows["text"], pa.string()),
        "tool": pa.array(rows["tool"], pa.string()),
    })


def _brute_prefix_pairs(convs):
    seqs = {c: [(r, t) for r, t, _ in v] for c, v in convs.items()}
    out = set()
    for a, sa in seqs.items():
        for b, sb in seqs.items():
            if a == b:
                continue
            if len(sb) > len(sa) and sb[:len(sa)] == sa:
                out.add((a, b, len(sa), False))
            elif len(sb) == len(sa) and sa == sb and a < b:
                out.add((a, b, len(sa), True))
    return out


FIXTURE = {
    # base conversation
    "c-base": [("user", "hi", ""), ("assistant", "hello", ""),
               ("user", "run it", ""), ("tool", "ok", "search")],
    # strict prefix of c-base (the retry pattern)
    "c-retry": [("user", "hi", ""), ("assistant", "hello", "")],
    # exact duplicate of c-base
    "c-dup": [("user", "hi", ""), ("assistant", "hello", ""),
              ("user", "run it", ""), ("tool", "ok", "search")],
    # same texts, different role on turn 1 -> NOT a prefix
    "c-role": [("user", "hi", ""), ("user", "hello", "")],
    # shares first turn only, then diverges
    "c-div": [("user", "hi", ""), ("assistant", "nope", "")],
    # unrelated
    "c-other": [("user", "what", ""), ("assistant", "no", "")],
    # single-turn prefix of c-base
    "c-one": [("user", "hi", "")],
}


def test_prefix_pairs_match_brute_force(ray_session):
    ds = ray.data.from_arrow(_ts_table(FIXTURE))
    got = {(r["conv_a"], r["conv_b"], r["prefix_len"], r["full_match"])
           for r in prefix_containment_pairs(ds).take_all()}
    want = _brute_prefix_pairs(FIXTURE)
    assert got == want
    # sanity on the planted shapes: retry + one are strict prefixes of
    # BOTH c-base and its exact dup; base<->dup is one full match
    assert ("c-retry", "c-base", 2, False) in got
    assert ("c-one", "c-dup", 1, False) in got
    assert ("c-base", "c-dup", 4, True) in got
    assert not any(a == "c-role" or b == "c-role" for a, b, _, _ in got
                   if "c-role" in (a, b) and "c-div" in (a, b))


def test_prefix_pairs_empty_keeps_schema(ray_session):
    convs = {"a": [("user", "x", "")], "b": [("user", "y", "")]}
    out = prefix_containment_pairs(ray.data.from_arrow(_ts_table(convs)))
    # Ray 2.49 drops schema through to_pandas() on a fully-empty
    # Dataset (see setjoin.py) — Dataset.schema() is the stable probe;
    # driver-facing query wrappers swap in an Arrow empty_table.
    assert set(out.schema().names) == {"conv_a", "conv_b", "prefix_len",
                                       "full_match"}
    assert out.count() == 0


def test_prefix_hash_positions_and_rolling_identity(ray_session):
    """The rolling hash must satisfy H_k = H_{k-1}*B + d_k — recompute
    sequentially from the turn digests and compare."""
    import hashlib

    ds = ray.data.from_arrow(_ts_table({"c": [
        ("user", "a", ""), ("assistant", "b", ""), ("user", "c", "")]}))
    rows = sorted(conv_prefix_hashes(ds).take_all(),
                  key=lambda r: r["pos"])
    h = 0
    for r in rows:
        rep = f"{FIX_ROLE[r['pos']]}\x1e{FIX_TXT[r['pos']]}"
        d = int.from_bytes(
            hashlib.blake2b(rep.encode(), digest_size=8).digest(), "big")
        h = (h * int(_B) + d) % (1 << 64)
        assert r["prefix_hash"] % (1 << 64) == h
    assert rows[-1]["is_last"] and rows[-1]["conv_len"] == 3


FIX_ROLE = ["user", "assistant", "user"]
FIX_TXT = ["a", "b", "c"]


def test_binv_is_inverse():
    assert (int(_B) * int(_BINV)) % (1 << 64) == 1


def test_tool_sequence_clusters(ray_session):
    convs = {
        "t1": [("user", "x", ""), ("tool", "r", "search"),
               ("tool", "r2", "fetch")],
        "t2": [("user", "completely different", ""),
               ("tool", "zz", "search"), ("tool", "q", "fetch")],
        "t3": [("user", "x", ""), ("tool", "r", "fetch"),
               ("tool", "r2", "search")],  # same tools, other order
        "t4": [("user", "no tools at all", "")],
        "t5": [("tool", "a", "search"), ("tool", "b", "fetch")],
    }
    ds = ray.data.from_arrow(_ts_table(convs))
    got = {(r["conv_id"], r["cluster_id"], r["cluster_size"])
           for r in tool_sequence_clusters(ds).take_all()}
    # t1/t2/t5 share 'search,fetch'; t3 is 'fetch,search' (alone); t4 none
    assert got == {("t1", "t1", 3), ("t2", "t1", 3), ("t5", "t1", 3)}


def test_tool_sequence_empty_keeps_schema(ray_session):
    convs = {"a": [("user", "x", "")]}
    out = tool_sequence_clusters(ray.data.from_arrow(_ts_table(convs)))
    assert set(out.schema().names) == {"conv_id", "cluster_id",
                                       "cluster_size"}
    assert out.count() == 0


def test_prefix_pairs_join_fallback_path(ray_session):
    """verify_broadcast_max=0 forces the distributed semi-join verify
    path; output must be identical to the broadcast path."""
    ds = ray.data.from_arrow(_ts_table(FIXTURE))
    a = {tuple(sorted(r.items()))
         for r in prefix_containment_pairs(ds).take_all()}
    b = {tuple(sorted(r.items()))
         for r in prefix_containment_pairs(
             ds, verify_broadcast_max=0).take_all()}
    assert a == b == {tuple(sorted(p.items())) for p in (
        dict(conv_a=x, conv_b=y, prefix_len=n, full_match=f)
        for x, y, n, f in _brute_prefix_pairs(FIXTURE))}


def test_conv_divergence_planted(ray_session):
    from raydedup.stages.convdedup import conv_divergence

    convs = {
        "d1": [("user", "a", ""), ("assistant", "b", ""),
               ("user", "c", "")],
        "d2": [("user", "a", ""), ("assistant", "b", ""),
               ("user", "DIFFERENT", ""), ("tool", "x", "t")],
        "d3": [("user", "zzz", "")],
        "d4": [("user", "a", ""), ("assistant", "b", ""),
               ("user", "c", "")],
    }
    ds = ray.data.from_arrow(_ts_table(convs))
    pairs = ray.data.from_arrow(pa.table({
        "conv_a": pa.array(["d1", "d1", "d1", "d1"], pa.string()),
        "conv_b": pa.array(["d2", "d3", "d4", "nope"], pa.string()),
    }))
    got = {(r["conv_a"], r["conv_b"]): (r["lcp"], r["a_len"], r["b_len"])
           for r in conv_divergence(ds, pairs).take_all()}
    assert got[("d1", "d2")] == (2, 3, 4)   # diverge at turn 2
    assert got[("d1", "d3")] == (0, 3, 1)   # nothing shared
    assert got[("d1", "d4")] == (3, 3, 3)   # identical
    assert got[("d1", "nope")] == (0, 3, None)  # unknown id kept


class TestDedupTurnsWithinConv:
    """dedup_turns_within_conv: first occurrence per (conv, text)."""

    def _run(self, rows, **kw):
        import ray.data

        import pyarrow as pa

        from raydedup.stages.convdedup import dedup_turns_within_conv

        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        out = dedup_turns_within_conv(ds, **kw)
        return {(r["conv_id"], r["turn_idx"])
                for r in out.select_columns(
                    ["conv_id", "turn_idx"]).take_all()}

    def test_planted_retry_storm(self, ray_session):
        rows = [
            {"conv_id": "c1", "turn_idx": 0, "text": "hi"},
            {"conv_id": "c1", "turn_idx": 1, "text": "retrying..."},
            {"conv_id": "c1", "turn_idx": 2, "text": "retrying..."},
            {"conv_id": "c1", "turn_idx": 3, "text": "retrying..."},
            {"conv_id": "c1", "turn_idx": 4, "text": "done"},
            # same text in ANOTHER conv must survive independently
            {"conv_id": "c2", "turn_idx": 0, "text": "retrying..."},
            {"conv_id": "c2", "turn_idx": 1, "text": "retrying..."},
        ]
        assert self._run(rows) == {("c1", 0), ("c1", 1), ("c1", 4),
                                   ("c2", 0)}

    def test_null_text_folds_to_empty(self, ray_session):
        rows = [
            {"conv_id": "c", "turn_idx": 0, "text": None},
            {"conv_id": "c", "turn_idx": 1, "text": ""},
            {"conv_id": "c", "turn_idx": 2, "text": "x"},
        ]
        # NULL and '' are the same identity: earliest (idx 0) survives
        assert self._run(rows) == {("c", 0), ("c", 2)}

    def test_no_dups_is_identity(self, ray_session):
        rows = [{"conv_id": f"c{i % 3}", "turn_idx": i, "text": f"t{i}"}
                for i in range(20)]
        assert self._run(rows) == {(f"c{i % 3}", i) for i in range(20)}

    def test_brute_parity_fuzz(self, ray_session):
        import random

        rng = random.Random(31)
        rows = []
        for c in range(12):
            for i in range(rng.randrange(1, 15)):
                rows.append({"conv_id": f"c{c}", "turn_idx": i,
                             "text": f"m{rng.randrange(5)}"})
        seen, exp = set(), set()
        for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
            k = (r["conv_id"], r["text"])
            if k not in seen:
                seen.add(k)
                exp.add((r["conv_id"], r["turn_idx"]))
        assert self._run(rows, num_partitions=5) == exp


def test_conv_turn_containment_planted(ray_session):
    """The q_conv_turn_containment composition on planted reruns:
    conv B = conv A's turns REARRANGED plus extra turns → (A, B) is a
    turn-multiset containment pair; a conv missing one of A's repeated
    turns is NOT (multiplicity counts)."""
    import hashlib

    import pyarrow as pa
    import ray.data

    from raydedup.config import DedupConfig
    from raydedup.stages.ordered import assemble_by_key
    from raydedup.stages.setjoin import set_containment_self_join
    from raydedup.stages.wjaccard import bag_element_sets

    cfg = DedupConfig().with_overrides(stemming=False,
                                       remove_stopwords=False)
    rows = []

    def conv(cid, texts):
        for i, t in enumerate(texts):
            rows.append({"conv_id": cid, "turn_idx": i, "text": t})

    conv("A", ["hello", "run it", "hello", "done"])
    conv("B", ["extra", "done", "hello", "run it", "hello", "more"])
    conv("C", ["done", "hello", "run it"])  # only ONE 'hello': not ⊇ A
    conv("D", ["unrelated", "turns"])
    ts = ray.data.from_arrow(pa.Table.from_pylist(rows))

    def md5s(b):
        hs = [hashlib.md5((t or "").encode()).hexdigest()
              for t in b["text"].to_pylist()]
        return pa.table({"conv_id": b["conv_id"],
                         "turn_idx": b["turn_idx"],
                         "tsha": pa.array(hs, pa.string())})

    streams = assemble_by_key(
        ts.map_batches(md5s, batch_format="pyarrow"), by="conv_id",
        order_cols=["turn_idx"], text_col="tsha", sep=" ",
        out="sha_stream").materialize()
    sets = bag_element_sets(streams, cfg, id_col="conv_id",
                            text_col="sha_stream")
    got = {(r["inner_id"], r["outer_id"])
           for r in set_containment_self_join(
               streams, 1.0, cfg, min_inner=2, id_col="conv_id",
               text_col="sha_stream", sets_ds=sets).take_all()}
    assert ("A", "B") in got
    assert ("C", "B") in got  # C's multiset is inside B too
    assert ("A", "C") not in got  # multiplicity blocks
    assert not any(x == "D" or y == "D" for x, y in got)
