"""Line-level corpus dedup (stages/linededup.py) vs brute force: a
line in >= min_docs distinct docs disappears everywhere, empty lines
survive, order is preserved, and the broadcast and join paths agree."""

import numpy as np

import ray.data

from raydedup.stages.linededup import line_dedup

LINES = [f"line number {i} content" for i in range(30)]


def _docs(rng, n=25):
    rows = []
    for i in range(n):
        k = int(rng.integers(1, 8))
        ls = [LINES[int(rng.integers(0, len(LINES)))] for _ in range(k)]
        if rng.random() < 0.3:
            ls.insert(int(rng.integers(0, len(ls) + 1)), "")
        rows.append({"doc_id": i, "text": "\n".join(ls)})
    return rows


def _brute(rows, min_docs):
    from collections import Counter

    nd = Counter()
    for r in rows:
        nd.update({ln for ln in r["text"].split("\n") if ln != ""})
    dup = {ln for ln, c in nd.items() if c >= min_docs}
    expected = {}
    for r in rows:
        ls = r["text"].split("\n")
        kept = [ln for ln in ls if ln not in dup]
        expected[r["doc_id"]] = ("\n".join(kept), len(ls),
                                 len(ls) - len(kept))
    return expected


def _run(rows, min_docs, **kw):
    out = line_dedup(ray.data.from_items(rows), min_docs, **kw)
    return {r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
            for r in out.take_all()}


def test_line_dedup_matches_bruteforce(ray_session):
    rng = np.random.default_rng(17)
    rows = _docs(rng)
    for min_docs in (2, 4):
        assert _run(rows, min_docs) == _brute(rows, min_docs)


def test_line_dedup_paths_agree(ray_session):
    rng = np.random.default_rng(23)
    rows = _docs(rng, n=30)
    expected = _brute(rows, 2)
    assert _run(rows, 2, method="broadcast") == expected
    assert _run(rows, 2, method="join") == expected


def test_line_dedup_wipeout_and_empties(ray_session):
    # doc 3's every line is duplicated elsewhere -> text becomes ''
    rows = [
        {"doc_id": 1, "text": "shared one\nunique a"},
        {"doc_id": 2, "text": "shared two\nunique b"},
        {"doc_id": 3, "text": "shared one\nshared two"},
        {"doc_id": 4, "text": ""},  # single empty line, always kept
    ]
    expected = _brute(rows, 2)
    assert expected[3] == ("", 2, 2)
    assert expected[4] == ("", 1, 0)
    assert _run(rows, 2, method="broadcast") == expected
    assert _run(rows, 2, method="join") == expected
    # repeats WITHIN one doc don't count as multi-doc duplication
    solo = [{"doc_id": 1, "text": "same\nsame\nother"},
            {"doc_id": 2, "text": "elsewhere"}]
    assert _run(solo, 2) == _brute(solo, 2)
    assert _run(solo, 2)[1] == ("same\nsame\nother", 3, 0)


def test_line_dedup_empty_input(ray_session):
    empty = ray.data.from_items([{"doc_id": 1, "text": "x"}]).filter(
        lambda r: False)
    out = line_dedup(empty, 2)
    assert out.count() == 0
    assert set(out.schema().names) == {
        "doc_id", "text", "n_lines", "n_removed"}


def test_line_dedup_custom_sep(ray_session):
    # paragraph-granularity: same semantics under sep='. '
    rows = [
        {"doc_id": 1, "text": "shared para. unique a. tail"},
        {"doc_id": 2, "text": "shared para. unique b"},
        {"doc_id": 3, "text": "solo only"},
    ]
    got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
           for r in line_dedup(ray.data.from_items(rows), 2,
                               sep=". ").take_all()}
    assert got[1] == ("unique a. tail", 3, 1)
    assert got[2] == ("unique b", 2, 1)
    assert got[3] == ("solo only", 1, 0)
    # join path agrees
    got_j = {r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
             for r in line_dedup(ray.data.from_items(rows), 2,
                                 sep=". ", method="join").take_all()}
    assert got_j == got


def test_self_line_dedup_planted(ray_session):
    import pyarrow as pa
    import ray.data

    from raydedup.stages.linededup import self_line_dedup

    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["a\nb\na\nc\nb",   # repeats of a and b drop
                 "",                 # single empty line survives
                 "x\n\nx\n\ny",      # dup 'x' and dup '' both drop
                 "solo"],            # untouched
    })
    out = {r["doc_id"]: r for r in
           self_line_dedup(ray.data.from_arrow(t)).take_all()}
    assert out[1]["text"] == "a\nb\nc"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (5, 2)
    assert out[2]["text"] == "" and out[2]["n_removed"] == 0
    assert out[3]["text"] == "x\n\ny"
    assert (out[3]["n_lines"], out[3]["n_removed"]) == (5, 2)
    assert out[4]["text"] == "solo" and out[4]["n_removed"] == 0


def test_self_line_dedup_matches_bruteforce(ray_session):
    import random

    import pyarrow as pa
    import ray.data

    from raydedup.stages.linededup import self_line_dedup

    rng = random.Random(7)
    docs = []
    for i in range(60):
        lines = [rng.choice(["hdr", "foo", "bar", "baz", ""])
                 for _ in range(rng.randrange(0, 12))]
        docs.append((i, "\n".join(lines)))
    out = {r["doc_id"]: r for r in self_line_dedup(
        ray.data.from_arrow(pa.table({
            "doc_id": [d[0] for d in docs],
            "text": [d[1] for d in docs]}))).take_all()}
    for i, text in docs:
        seen, kept = set(), []
        for ln in text.split("\n"):
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        assert out[i]["text"] == "\n".join(kept), i
        assert out[i]["n_lines"] == len(text.split("\n"))
        assert out[i]["n_removed"] == len(text.split("\n")) - len(kept)
