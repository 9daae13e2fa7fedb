"""Suffix-array span pass + multimodal plumbing + textstats."""

from difflib import SequenceMatcher

import pyarrow as pa
import pytest

import ray.data

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.multimodal import (
    attach_fake_payloads,
    DecodeImage,
    decode_images,
    sample_frames,
)
from raydedup.stages.suffix_span import (
    lcp_array,
    long_span_pairs,
    longest_common_substring,
    suffix_array,
)
from raydedup.stages.textstats import (
    detect_language,
    fingerprints,
    quality_scores,
    token_counts,
)


def test_suffix_array_correct():
    s = b"banana"
    sa = suffix_array(s).tolist()
    expected = sorted(range(len(s)), key=lambda i: s[i:])
    assert sa == expected
    lcp = lcp_array(s, suffix_array(s))
    # suffixes sorted: a, ana, anana, banana, na, nana → lcp 0,1,3,0,0,2
    assert lcp.tolist() == [0, 1, 3, 0, 0, 2]


def test_lcs_matches_difflib():
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "slow start but the quick brown fox jumps high"
    m = SequenceMatcher(None, a, b, autojunk=False).find_longest_match(
        0, len(a), 0, len(b)
    )
    assert longest_common_substring(a, b) == m.size


def test_long_span_pairs_detects_planted_span():
    span = "S " * 150  # 300 chars shared verbatim
    rows = {
        "conv_id": ["a", "b", "c"],
        "turn_idx": pa.array([0, 0, 0], type=pa.int32()),
        "row_key": ["a:0", "b:0", "c:0"],
        "text": [
            "unique prefix one " + span + "unique suffix one",
            "other beginning " + span + "different ending",
            "completely unrelated text with no shared spans at all here",
        ],
    }
    ds = ray.data.from_arrow(pa.table(rows))
    got = long_span_pairs(ds, DEFAULT_CONFIG).take_all()
    assert {(r["a_key"], r["b_key"]) for r in got} == {("a:0", "b:0")}
    assert got[0]["span_len"] >= DEFAULT_CONFIG.min_span_chars


def test_long_span_no_false_pairs():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "row_key": ["x", "y"],
                "text": ["short one", "short two"],
            }
        )
    )
    assert long_span_pairs(ds, DEFAULT_CONFIG).count() == 0


# --- multimodal plumbing ---------------------------------------------------


def _docs_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "row_key": ["a", "b", "c"],
                "text": ["first doc", "second doc", "third doc"],
            }
        )
    )


def test_fake_payload_roundtrip_and_decode():
    ds = attach_fake_payloads(_docs_ds())
    rows = ds.take_all()
    assert all(isinstance(r["payload"], bytes) and len(r["payload"]) >= 256
               for r in rows)
    decoded = decode_images(ds, fake=True).take_all()
    assert all(r["meta_w"] >= 16 and r["meta_h"] >= 16 for r in decoded)
    # deterministic: same text → same payload → same dims
    again = decode_images(attach_fake_payloads(_docs_ds()), fake=True).take_all()
    assert [(r["meta_w"], r["meta_h"]) for r in decoded] == [
        (r["meta_w"], r["meta_h"]) for r in again
    ]


def test_real_decode_raises():
    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)._decode(b"\x89PNG")


def test_resize_and_frames():
    ds = attach_fake_payloads(_docs_ds())
    resized = decode_images(ds, fake=True, resize_to=(64, 64)).take_all()
    assert all(r["meta_w"] == 64 and r["meta_h"] == 64 for r in resized)
    frames = sample_frames(ds, every_n=3).take_all()
    assert len(frames) > 0
    assert all(f["frame_idx"] % 3 == 0 for f in frames)


# --- textstats -------------------------------------------------------------


def test_token_counts():
    ds = ray.data.from_arrow(
        pa.table({"row_key": ["a", "b"], "text": ["one two  three", "x,y!"]})
    )
    rows = {r["row_key"]: r for r in token_counts(ds).take_all()}
    assert rows["a"]["ws_tokens"] == 3
    assert rows["b"]["ws_tokens"] == 1
    assert rows["b"]["bpe_tokens"] == 4  # x , y !


def test_quality_scores():
    ds = ray.data.from_arrow(
        pa.table({"row_key": ["a"], "text": ["The cat, the hat."]})
    )
    r = quality_scores(ds).take_all()[0]
    assert r["n_words"] == 4
    assert r["stopword_ratio"] == pytest.approx(2 / 4)  # 'the' twice ('the'
    # from 'the hat.' keeps trailing punct out via lower().split 'hat.')
    assert r["punct_ratio"] == pytest.approx(2 / len("The cat, the hat."))


def test_langid_deterministic():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "row_key": ["en", "de", "zh"],
                "text": [
                    "the cat and the dog that is in you",
                    "der hund und die katze ist nicht ein",
                    "这是 一个 中文 文本",
                ],
            }
        )
    )
    rows = {r["row_key"]: r["detected_lang"] for r in detect_language(ds).take_all()}
    assert rows == {"en": "en", "de": "de", "zh": "zh"}


def test_fingerprints_shared_for_identical_text():
    long_text = "abcdefghij " * 30
    ds = ray.data.from_arrow(
        pa.table({"row_key": ["a", "b"], "text": [long_text, long_text]})
    )
    rows = {r["row_key"]: r["fingerprints"] for r in fingerprints(ds).take_all()}
    assert rows["a"] == rows["b"]
    assert len(rows["a"]) > 0
