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


def test_winnow_batch_matches_scalar_reference():
    """_winnow_hashes_batch (one poly pass over the Arrow utf-8 buffer +
    sparse-table sliding min) must be bit-identical per row to the
    scalar _winnow_hashes it replaced — including multi-byte utf-8,
    nulls, empties, sub-k rows, exactly-window rows and long rows."""
    import random

    import numpy as np

    from raydedup.stages.suffix_span import _winnow_hashes, _winnow_hashes_batch

    rng = random.Random(99)
    k, window = 8, 12
    alphabet = "abcdeé日 "
    texts: list = [None, "", "short", "x" * (k - 1), "y" * k,
                   "z" * (k + window - 1), "w" * (k + window)]
    for _ in range(60):
        texts.append("".join(rng.choice(alphabet)
                             for _ in range(rng.randrange(0, 200))))
    # shared long span between two rows must fingerprint identically
    span = "the quick brown fox jumps over the lazy dog " * 3
    texts += ["AAA " + span + " BBB", "CCCCC " + span + " DD"]

    col = pa.chunked_array([pa.array(texts[:30], pa.string()),
                            pa.array(texts[30:], pa.string())])
    rid, val = _winnow_hashes_batch(col, k, window)
    got: dict[int, set] = {}
    for r, v in zip(rid.tolist(), val.tolist()):
        got.setdefault(r, set()).add(v)
    for i, t in enumerate(texts):
        want = set(np.asarray(_winnow_hashes(t or "", k, window)).tolist())
        assert got.get(i, set()) == want, f"row {i}: {t!r}"
    # large_string path
    rid2, val2 = _winnow_hashes_batch(
        pa.array(texts, pa.large_string()), k, window)
    assert rid2.tolist() == rid.tolist() and val2.tolist() == val.tolist()


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


def test_real_decode_unknown_format_raises():
    dec = DecodeImage(fake=False)
    if dec.pil is not None:
        pytest.skip("PIL present: PNG handled for real")
    with pytest.raises(ValueError):
        dec._decode(b"\x89PNG")


def test_avi_roundtrip_and_real_frame_sampling():
    import numpy as np

    from raydedup.stages.multimodal import (
        attach_synthetic_videos,
        decode_avi,
        encode_avi,
        sample_video_frames,
    )

    # codec round trip, including odd widths (stride padding)
    for w, h, nf in [(8, 8, 1), (9, 7, 3), (16, 14, 6)]:
        frames = [np.arange(3 * w * h, dtype=np.int64) % 256 + f
                  for f in range(nf)]
        frames = [f % 256 for f in frames]
        w2, h2, out = decode_avi(encode_avi(w, h, frames))
        assert (w2, h2, len(out)) == (w, h, nf)
        for f in range(nf):
            assert np.array_equal(
                out[f], frames[f].astype(np.uint8).reshape(h, w, 3))

    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")

    # real sampling end-to-end: every 2nd frame, sums match the
    # closed-form pixel function
    ds = attach_synthetic_videos(
        ray.data.from_arrow(pa.table({"doc_id": list(range(12))})))
    rows = sample_video_frames(ds, every_n=2, id_col="doc_id").take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in range(12):
        w, h, nf = 8 + d % 9, 8 + d % 7, 2 + d % 5
        got = sorted(by_doc[d], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in got] == list(range(0, nf, 2))
        for r in got:
            assert (r["meta_w"], r["meta_h"]) == (w, h)
            exp = int((((np.int64(11 * d + 5 * r["frame_idx"]))
                        + np.arange(3 * w * h, dtype=np.int64)) % 256).sum())
            assert r["frame_sum"] == exp


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


# --- real codecs -------------------------------------------------------------


def test_ppm_roundtrip():
    import numpy as np

    from raydedup.stages.multimodal import decode_ppm, encode_ppm

    w, h = 5, 3
    pix = np.arange(3 * w * h, dtype=np.uint8)
    got_w, got_h, img = decode_ppm(encode_ppm(w, h, pix))
    assert (got_w, got_h) == (w, h)
    assert img.shape == (h, w, 3)
    assert np.array_equal(img.reshape(-1), pix)


def test_ppm_comment_header():
    import numpy as np

    from raydedup.stages.multimodal import decode_ppm

    pix = bytes(range(12))
    payload = b"P6\n# a comment\n2 2\n255\n" + pix
    w, h, img = decode_ppm(payload)
    assert (w, h) == (2, 2)
    assert img.tobytes() == pix


def test_bmp_decode():
    import numpy as np

    from raydedup.stages.multimodal import decode_bmp

    # hand-built 2x2 uncompressed 24-bit BMP, bottom-up rows, 4-byte padded
    w, h = 2, 2
    stride = (3 * w + 3) & ~3  # 8
    # rows bottom-up: row0(bottom) = red,green  row1(top) = blue,white
    red, green, blue, white = b"\x00\x00\xff", b"\x00\xff\x00", b"\xff\x00\x00", b"\xff\xff\xff"
    pixel_data = (red + green + b"\x00\x00") + (blue + white + b"\x00\x00")
    header = (
        b"BM" + (54 + len(pixel_data)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(pixel_data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    gw, gh, img = decode_bmp(header + pixel_data)
    assert (gw, gh) == (w, h)
    # top row first after flip; BGR converted to RGB
    assert img[0, 0].tolist() == [0, 0, 255]    # blue
    assert img[0, 1].tolist() == [255, 255, 255]
    assert img[1, 0].tolist() == [255, 0, 0]    # red
    assert img[1, 1].tolist() == [0, 255, 0]    # green


def test_wav_roundtrip():
    import numpy as np

    from raydedup.stages.multimodal import decode_wav, encode_wav

    samples = (np.sin(np.linspace(0, 20, 800)) * 3000).astype(np.int16)
    sr, n, got = decode_wav(encode_wav(16000, samples))
    assert sr == 16000
    assert n == 800
    assert np.array_equal(got, samples)


def test_image_features_vs_brute(ray_session):
    """decode → resize → channel sums must equal the per-image numpy
    brute force (decode_ppm + resize_nearest + sum per channel)."""
    import numpy as np

    from raydedup.stages.multimodal import (
        attach_synthetic_images,
        decode_ppm,
        image_features,
        resize_nearest,
    )

    tbl = pa.table({"doc_id": list(range(40)),
                    "text": ["x"] * 40})
    src = attach_synthetic_images(ray.data.from_arrow(tbl))
    got = {r["doc_id"]: r for r in
           image_features(src, resize_to=(5, 7)).take_all()}
    payloads = {r["doc_id"]: r["payload"] for r in src.take_all()}
    assert len(got) == 40
    for d, p in payloads.items():
        _, _, img = decode_ppm(p)
        rz = resize_nearest(img, 5, 7)
        ch = rz.sum(axis=(0, 1), dtype=np.int64)
        r = got[d]
        assert (r["out_w"], r["out_h"]) == (5, 7)
        assert (r["r_sum"], r["g_sum"], r["b_sum"]) == tuple(ch.tolist())
        assert r["pix_sum"] == int(ch.sum())


def test_resize_nearest():
    import numpy as np

    from raydedup.stages.multimodal import resize_nearest

    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    out = resize_nearest(img, 4, 4)
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out[0, 0], img[0, 0])
    assert np.array_equal(out[3, 3], img[1, 1])


def test_synthetic_images_real_decode():
    """Real PPM payloads decoded by the real kernel: dims + pixel checksum
    must equal the closed-form oracle values."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from raydedup.stages.multimodal import attach_synthetic_images, decode_images

    ids = [0, 1, 5, 16, 17, 123, 9999]
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64())}))
    rows = {r["doc_id"]: r
            for r in decode_images(attach_synthetic_images(ds)).take_all()}
    for d in ids:
        w, h = 16 + d % 17, 16 + d % 13
        pix = (np.int64(7 * d) + np.arange(3 * w * h, dtype=np.int64)) % 256
        r = rows[d]
        assert r["meta_w"] == w and r["meta_h"] == h
        assert r["pix_sum"] == int(pix.sum())
        assert r["media_type"] == "image/ppm"


def test_decode_audio_stage():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from raydedup.stages.multimodal import decode_audio, encode_wav

    payloads = [encode_wav(8000 * (i + 1), np.zeros(100 * (i + 1), np.int16))
                for i in range(3)]
    ds = ray.data.from_arrow(pa.table({"payload": pa.array(payloads, type=pa.binary())}))
    rows = sorted(decode_audio(ds).take_all(), key=lambda r: r["meta_sr"])
    assert [r["meta_sr"] for r in rows] == [8000, 16000, 24000]
    assert [r["meta_samples"] for r in rows] == [100, 200, 300]


def test_langid_labeled_fixtures():
    """Real sentences in 9 languages must get the right label."""
    import pyarrow as pa
    import ray.data

    from raydedup.stages.textstats import detect_language

    fixtures = [
        ("en", "The quick brown fox jumps over the lazy dog and it was "
               "not at all surprised by this turn of events."),
        ("de", "Der schnelle braune Fuchs springt über den faulen Hund "
               "und ist nicht überrascht von dieser Wendung."),
        ("es", "El rápido zorro marrón salta sobre el perro perezoso y "
               "no está sorprendido por este giro de los acontecimientos."),
        ("fr", "Le renard brun rapide saute par-dessus le chien paresseux "
               "et il n'est pas du tout surpris par cette tournure."),
        ("it", "La rapida volpe marrone salta sopra il cane pigro e non "
               "è per niente sorpresa da questo giro di eventi."),
        ("pt", "A rápida raposa marrom pula sobre o cão preguiçoso e não "
               "está nada surpresa com essa virada dos acontecimentos."),
        ("nl", "De snelle bruine vos springt over de luie hond en hij is "
               "er niet door verrast, want dat was te verwachten."),
        ("zh", "敏捷的棕色狐狸跳过了懒狗，它对这一转折并不感到惊讶。"),
        ("ru", "Быстрая коричневая лиса перепрыгивает через ленивую "
               "собаку и совсем не удивлена таким поворотом событий."),
    ]
    tbl = pa.table({
        "expected": pa.array([f[0] for f in fixtures]),
        "text": pa.array([f[1] for f in fixtures]),
    })
    rows = detect_language(ray.data.from_arrow(tbl)).take_all()
    wrong = [(r["expected"], r["detected_lang"]) for r in rows
             if r["expected"] != r["detected_lang"]]
    assert not wrong, wrong


def test_hot_boilerplate_bounded_and_connected():
    """A boilerplate block shared by many docs makes every fingerprint
    hot. The member cap must bound candidate generation (pair budget)
    while per-fp rotation sampling keeps the true-duplicate family
    CONNECTED (what downstream union-find clustering needs)."""
    import pyarrow as pa

    from raydedup.config import DEFAULT_CONFIG
    from raydedup.stages.suffix_span import long_span_pairs
    from raydedup.state.unionfind import UnionFind

    n = 60
    boiler = ("standard legal disclaimer text repeated verbatim in every "
              "document of this synthetic boilerplate-heavy corpus, long "
              "enough to exceed the minimum span threshold easily " * 4)
    rows = {
        "row_key": [f"d{i:03d}" for i in range(n)],
        "text": [f"unique head {i} " + boiler + f" unique tail {i}"
                 for i in range(n)],
    }
    ds = ray.data.from_arrow(pa.table(rows))
    cap = 8
    got = long_span_pairs(ds, DEFAULT_CONFIG, fp_member_cap=cap).take_all()
    pairs = {(r["a_key"], r["b_key"]) for r in got}
    # pair budget: far below the n^2/2 blowup
    assert 0 < len(pairs) < n * (n - 1) / 2
    # every found pair is a true long-span pair
    assert all(r["span_len"] >= DEFAULT_CONFIG.min_span_chars for r in got)
    # connectivity: union-find over the capped pairs links the whole family
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    roots = {uf.find(k) for k in rows["row_key"]}
    assert len(roots) == 1


def test_repetition_stats_known_values(ray_session):
    import ray.data

    from raydedup.stages.textstats import repetition_stats

    tbl = pa.table({
        "doc_id": [0, 1, 2],
        "text": [
            # 4 non-empty lines, 2 distinct -> dup_line_frac 0.5;
            # tokens: a b a b c d c d -> top 2-gram 'a b' (= 'c d') 2/7
            "a b\na b\n\nc d\nc d",
            "x y z",          # no repetition at all
            "",               # empty: all zeros
        ],
    })
    got = {r["doc_id"]: r for r in
           repetition_stats(ray.data.from_arrow(tbl)).take_all()}
    r0 = got[0]
    assert r0["dup_line_frac"] == pytest.approx(0.5)
    toks = "a b a b c d c d".split()
    assert r0["top_2gram_frac"] == pytest.approx(2 / (len(toks) - 1))
    assert got[1]["dup_line_frac"] == 0.0
    assert got[1]["top_2gram_frac"] == pytest.approx(1 / 2)  # all 2-grams tie at 1
    assert got[1]["dup_3gram_frac"] == 0.0
    assert got[2]["dup_line_frac"] == 0.0
    assert got[2]["top_2gram_frac"] == 0.0
    assert got[2]["dup_3gram_frac"] == 0.0
    # repeated 3-gram document: every 3-gram occurrence duplicated
    tbl2 = pa.table({"doc_id": [0], "text": ["p q r p q r p q r"]})
    (r,) = repetition_stats(ray.data.from_arrow(tbl2)).take_all()
    assert r["dup_3gram_frac"] == pytest.approx(1.0)


def test_sample_by_hash_deterministic_and_consistent(ray_session):
    import ray.data

    from raydedup.stages.textstats import sample_by_hash

    keys = [f"k{i}" for i in range(2000)]
    tbl = pa.table({"k": keys, "v": list(range(2000))})
    ds = ray.data.from_arrow(tbl)
    a = {r["k"] for r in sample_by_hash(ds, "k", 0.3, "s1").take_all()}
    b = {r["k"] for r in sample_by_hash(ds, "k", 0.3, "s1").take_all()}
    assert a == b  # rerun-stable
    assert 0.2 < len(a) / 2000 < 0.4  # near the rate
    # monotone in rate: the 0.3 sample is a subset of the 0.5 sample
    c = {r["k"] for r in sample_by_hash(ds, "k", 0.5, "s1").take_all()}
    assert a <= c
    # different seed -> different (but overlapping) sample
    d = {r["k"] for r in sample_by_hash(ds, "k", 0.3, "s2").take_all()}
    assert a != d
    # rate bounds
    assert sample_by_hash(ds, "k", 0.0, "s1").count() == 0
    assert sample_by_hash(ds, "k", 1.0, "s1").count() == 2000
    with pytest.raises(ValueError):
        sample_by_hash(ds, "k", 1.5)


def test_decontaminate_plants(ray_session):
    import ray.data

    from raydedup.stages.decontam import decontaminate

    bench = ray.data.from_arrow(pa.table({
        "doc_id": [100],
        "text": ["alpha beta gamma delta epsilon zeta eta theta iota"],
    }))
    corpus = pa.table({
        "doc_id": [0, 1, 2],
        "text": [
            # contains the benchmark 8-gram "alpha ... theta"
            "prefix words alpha beta gamma delta epsilon zeta eta theta "
            "suffix words",
            # shares 7-gram but not 8-gram
            "beta gamma delta epsilon zeta eta theta other tail here",
            "completely unrelated text with enough words to form eight "
            "grams easily",
        ],
    })
    got = {r["doc_id"]: r for r in
           decontaminate(ray.data.from_arrow(corpus), bench,
                         n=8).take_all()}
    assert got[0]["contaminated"] and got[0]["n_hit"] >= 1
    assert not got[1]["contaminated"] and got[1]["n_hit"] == 0
    assert not got[2]["contaminated"]
    # drop mode removes the contaminated row and the flag columns
    kept = decontaminate(ray.data.from_arrow(corpus), bench, n=8,
                         drop=True)
    rows = kept.take_all()
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert "contaminated" not in rows[0]


def test_pack_sequences_budget_and_determinism(ray_session):
    import ray.data

    from raydedup.stages.textstats import pack_sequences

    # one partition so the scan order is the full key order
    tbl = pa.table({
        "doc_id": list(range(10)),
        "text": [
            "a b c",            # 3
            "a b c d",          # 4
            "a b",              # 2  -> pack 0 holds 3+4+2=9 <= 10
            "a b c d e",        # 5  -> 9+5>10: new pack
            " ".join(["w"] * 15),  # 15 > budget: own pack
            "a", "a", "a", "a", "a",
        ],
    })
    out = pack_sequences(ray.data.from_arrow(tbl), 10,
                         num_partitions=1).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["pack_id"] == by_id[1]["pack_id"] == by_id[2]["pack_id"]
    assert by_id[3]["pack_id"] != by_id[2]["pack_id"]
    # oversized doc occupies its own pack
    big_pack = by_id[4]["pack_id"]
    assert sum(1 for r in out if r["pack_id"] == big_pack) == 1
    # budget respected for every multi-doc pack
    sums: dict[int, int] = {}
    counts: dict[int, int] = {}
    for r in out:
        sums[r["pack_id"]] = sums.get(r["pack_id"], 0) + r["ws_tokens"]
        counts[r["pack_id"]] = counts.get(r["pack_id"], 0) + 1
    for p, s in sums.items():
        assert s <= 10 or counts[p] == 1
    # deterministic across reruns
    out2 = pack_sequences(ray.data.from_arrow(tbl), 10,
                          num_partitions=1).take_all()
    assert sorted((r["doc_id"], r["pack_id"]) for r in out) == \
           sorted((r["doc_id"], r["pack_id"]) for r in out2)
    # string keys partition stably too
    tbl2 = pa.table({"doc_id": [f"k{i}" for i in range(10)],
                     "text": tbl["text"]})
    o3 = pack_sequences(ray.data.from_arrow(tbl2), 10,
                        num_partitions=4).take_all()
    assert len(o3) == 10


def test_redact_pii_counts_and_masking(ray_session):
    import ray.data

    from raydedup.stages.textstats import redact_pii

    tbl = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "reach me at jo.smith+x@mail.example.org today",
            "call +44 123 456 7890 or +1 555 010 22",
            "server 192.168.0.1 and 10.0.255.254 are up",
            "nothing sensitive here",
        ],
    })
    got = {r["doc_id"]: r for r in
           redact_pii(ray.data.from_arrow(tbl)).take_all()}
    assert got[0]["n_email"] == 1 and got[0]["n_phone"] == 0
    assert got[0]["redacted"] == "reach me at [EMAIL] today"
    assert got[1]["n_phone"] == 2
    assert got[1]["redacted"] == "call [PHONE] or [PHONE]"
    assert got[2]["n_ip"] == 2
    assert got[2]["redacted"] == "server [IP] and [IP] are up"
    assert got[3]["n_email"] == got[3]["n_phone"] == got[3]["n_ip"] == 0
    assert got[3]["redacted"] == "nothing sensitive here"
    # null text survives as empty
    tbl2 = pa.table({"doc_id": [9], "text": pa.array([None], pa.string())})
    (r,) = redact_pii(ray.data.from_arrow(tbl2)).take_all()
    assert r["redacted"] == "" and r["n_email"] == 0
    # overlap: counts run on the ORIGINAL text (oracle parity), so the
    # IP-shape inside the email is counted even though [EMAIL] masks it
    tbl3 = pa.table({"doc_id": [1], "text": ["mail user@1.2.3.4.com now"]})
    (r3,) = redact_pii(ray.data.from_arrow(tbl3)).take_all()
    assert r3["n_email"] == 1 and r3["n_ip"] == 1
    assert r3["redacted"] == "mail [EMAIL] now"


def test_quota_by_group_exact_vs_bruteforce(ray_session):
    import collections
    import hashlib

    import ray.data

    from raydedup.stages.textstats import quota_by_group

    def h60(key, seed="s0"):
        return int.from_bytes(
            hashlib.md5(f"{seed}:{key}".encode()).digest()[:8], "big") >> 4

    groups = ["a"] * 50 + ["b"] * 7 + ["c"] * 200
    keys = list(range(len(groups)))
    tbl = pa.table({"source": groups, "doc_id": keys, "v": keys})
    ds = ray.data.from_arrow(tbl).repartition(9)
    out = quota_by_group(ds, "source", "doc_id", 10).take_all()
    byg = collections.defaultdict(list)
    for g, k in zip(groups, keys):
        byg[g].append(k)
    expect = {(g, k) for g, ks in byg.items()
              for k in sorted(ks, key=lambda x: (h60(x), x))[:10]}
    got = {(r["source"], r["doc_id"]) for r in out}
    assert got == expect               # exact winners, incl. group b < k
    assert len(got) == 10 + 7 + 10
    # payload columns survive the filter
    assert all("v" in r for r in out)
    # string keys
    skeys = [f"k{i}" for i in keys]
    out2 = quota_by_group(
        ray.data.from_arrow(pa.table({"source": groups, "doc_id": skeys})),
        "source", "doc_id", 3).take_all()
    expect2 = {(g, k) for g, ks in (
        (g, [f"k{i}" for i, gg in zip(keys, groups) if gg == g])
        for g in set(groups))
        for k in sorted(ks, key=lambda x: (h60(x), x))[:3]}
    assert {(r["source"], r["doc_id"]) for r in out2} == expect2
    with pytest.raises(ValueError):
        quota_by_group(ds, "source", "doc_id", 0)


def test_topk_by_group_vs_bruteforce(ray_session):
    import random

    import ray.data

    from raydedup.stages.textstats import topk_by_group

    rng = random.Random(9)
    n = 500
    grp = [f"g{rng.randrange(8)}" for _ in range(n)]
    # coarse values force ties so the doc-id tie-break is exercised
    val = [float(rng.randrange(5)) for _ in range(n)]
    tbl = pa.table({"src": grp, "score": val, "id": list(range(n))})
    ds = ray.data.from_arrow(tbl).repartition(11)

    def brute(largest):
        out = set()
        for g in set(grp):
            rows = [(v, i) for gg, v, i in zip(grp, val, range(n))
                    if gg == g]
            rows.sort(key=lambda r: (-r[0], r[1]) if largest
                      else (r[0], r[1]))
            out.update((g, i) for _, i in rows[:7])
        return out

    got = {(r["src"], r["id"]) for r in
           topk_by_group(ds, "src", "id", "score", 7).take_all()}
    assert got == brute(True)
    got_min = {(r["src"], r["id"]) for r in
               topk_by_group(ds, "src", "id", "score", 7,
                             largest=False).take_all()}
    assert got_min == brute(False)
    # k larger than every group keeps everything
    assert topk_by_group(ds, "src", "id", "score", 1000).count() == n


def test_characteristic_terms_ranking(ray_session):
    import ray.data

    from raydedup.stages.textstats import characteristic_terms

    tbl = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "apple apple banana",     # tf: apple 2 -> top
            "banana cherry",          # tf tie 1-1: banana df=2, cherry
                                      # df=1 -> rarer cherry wins
            "apple banana",           # tf tie: apple df=2 = banana df=2
                                      # -> lexicographic apple
            "",                       # no tokens: omitted
        ],
    })
    got = {r["doc_id"]: r for r in characteristic_terms(
        ray.data.from_arrow(tbl).repartition(3)).take_all()}
    assert set(got) == {0, 1, 2}
    assert got[0]["top_term"] == "apple" and got[0]["tf"] == 2
    assert got[1]["top_term"] == "cherry" and got[1]["df"] == 1
    assert got[2]["top_term"] == "apple"
    # df is corpus-global: apple appears in docs 0 and 2
    assert got[0]["df"] == 2 and got[2]["df"] == 2


def test_characteristic_terms_vs_bruteforce(ray_session):
    """Random corpus (with nulls and token-free docs) vs a per-doc
    Python brute force of the same (-tf, df, token) argmin — guards the
    vectorized two-pass path (batch regex split + dictionary codes +
    df>=2 broadcast, hapax df defaulting to 1)."""
    import random
    import re

    import ray.data

    from raydedup.stages.textstats import characteristic_terms

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(200):
        if i % 17 == 0:
            texts.append(None)
        elif i % 23 == 0:
            texts.append("!!! ...")
        else:
            texts.append(" ".join(rng.choice(vocab)
                                  for _ in range(rng.randrange(1, 12))))
    tbl = pa.table({"doc_id": list(range(200)), "text": texts})

    tok = re.compile(r"[0-9a-z_]+")
    df: dict[str, set] = {}
    for i, t in enumerate(texts):
        for w in set(tok.findall((t or "").lower())):
            df.setdefault(w, set()).add(i)
    want = {}
    for i, t in enumerate(texts):
        counts: dict[str, int] = {}
        for w in tok.findall((t or "").lower()):
            counts[w] = counts.get(w, 0) + 1
        if counts:
            w, tf = min(counts.items(),
                        key=lambda kv: (-kv[1], len(df[kv[0]]), kv[0]))
            want[i] = (w, tf, len(df[w]))
    got = {r["doc_id"]: (r["top_term"], r["tf"], r["df"]) for r in
           characteristic_terms(
               ray.data.from_arrow(tbl).repartition(7)).take_all()}
    assert got == want


def test_grouped_quantiles_vs_bruteforce(ray_session):
    import math
    import random

    import ray.data

    from raydedup.stages.stats import grouped_quantiles

    rng = random.Random(13)
    grp = [f"s{rng.randrange(5)}" for _ in range(800)]
    # heavy duplication so cross-batch count merging is exercised
    val = [rng.randrange(20) for _ in range(800)]
    ds = ray.data.from_arrow(pa.table({"src": grp, "x": val,
                                       "junk": grp})).repartition(9)
    qs = [0.0, 0.5, 0.9, 0.99, 1.0]
    got = {r["src"]: r for r in grouped_quantiles(
        ds, "src", "x", qs).take_all()}
    for g in set(grp):
        vs = sorted(v for gg, v in zip(grp, val) if gg == g)
        for q, nm in zip(qs, ["p0", "p50", "p90", "p99", "p100"]):
            idx = max(0, math.ceil(q * len(vs)) - 1)
            assert got[g][nm] == vs[idx], (g, q)
    with pytest.raises(ValueError):
        grouped_quantiles(ds, "src", "x", [1.5])


def test_inverted_index_postings(ray_session):
    import ray.data

    from raydedup.stages.collection import inverted_index

    tbl = pa.table({
        "doc_id": [5, 2, 9],
        "text": ["apple banana apple", "banana", ""],
    })
    got = {r["term"]: r for r in inverted_index(
        ray.data.from_arrow(tbl).repartition(2)).take_all()}
    assert set(got) == {"apple", "banana"}
    assert got["apple"]["postings"] == "5" and got["apple"]["df"] == 1
    # distinct per doc, ascending ids across partitions
    assert got["banana"]["postings"] == "2,5" and got["banana"]["df"] == 2


def test_cross_corpus_exact_matches(ray_session):
    import ray.data

    from raydedup.stages.decontam import cross_corpus_exact_matches

    corpus = ray.data.from_arrow(pa.table({
        "rid": [0, 1, 2, 3],
        "text": ["shared text", "unique corpus text", "shared text", ""],
    })).repartition(2)
    ref = ray.data.from_arrow(pa.table({
        "doc_id": [10, 11, 12],
        "text": ["shared text", "shared text", "only in ref"],
    }))
    got = {(r["rid"], r["ref_doc_id"]) for r in
           cross_corpus_exact_matches(corpus, ref,
                                      ref_key_col="doc_id").take_all()}
    # many-to-many: each matching corpus row x each identical ref row;
    # empty corpus text matches nothing
    assert got == {(0, 10), (0, 11), (2, 10), (2, 11)}
    import pytest as _pt
    with _pt.raises(ValueError):
        cross_corpus_exact_matches(corpus, ref, ref_key_col="doc_id",
                                   out_col="rid")


def test_ngram_novelty_counts(ray_session):
    import ray.data

    from raydedup.stages.decontam import ngram_novelty

    tbl = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b c d",          # grams: 'a b c','b c d'
            "x y a b c",        # grams: 'x y a','y a b','a b c'
            "only two",         # < 3 tokens: omitted
            "z z z z z",        # 'z z z' x3 -> ONE distinct gram, unshared
        ],
    })
    got = {r["doc_id"]: r for r in ngram_novelty(
        ray.data.from_arrow(tbl).repartition(3)).take_all()}
    assert set(got) == {0, 1, 3}
    assert got[0]["n_grams"] == 2 and got[0]["n_shared"] == 1  # 'a b c'
    assert got[1]["n_grams"] == 3 and got[1]["n_shared"] == 1
    assert got[3]["n_grams"] == 1 and got[3]["n_shared"] == 0


def test_normalize_text_kernels(ray_session):
    import ray.data

    from raydedup.stages.textstats import normalize_text

    tbl = pa.table({"doc_id": [0, 1, 2, 3],
                    "text": pa.array(["  Hello,   WORLD!! (x1)\t",
                                      "already clean", "...", None],
                                     pa.string())})
    got = {r["doc_id"]: r["norm_text"] for r in
           normalize_text(ray.data.from_arrow(tbl)).take_all()}
    assert got[0] == "hello world x1"
    assert got[1] == "already clean"
    assert got[2] == ""            # punctuation-only collapses to empty
    assert got[3] is None          # nulls pass through


def test_rolling_kgram_hashes_property():
    """The O(1)-per-byte modular-inverse rolling hash must equal the
    direct powers formula for random bytes and k values (hypothesis-style
    sweep; uint64 wraparound everywhere)."""
    import numpy as np

    from raydedup.stages.suffix_span import _rolling_kgram_hashes

    rng = np.random.default_rng(21)
    B = np.uint64(1000003)
    for trial in range(20):
        k = int(rng.integers(2, 64))
        n = int(rng.integers(k, 500))
        data = rng.integers(0, 256, n).astype(np.uint8)
        got = _rolling_kgram_hashes(data, k)
        powers = B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        n_pos = n - k + 1
        want = np.zeros(n_pos, dtype=np.uint64)
        for j in range(k):
            want += data[j:j + n_pos].astype(np.uint64) * powers[j]
        assert np.array_equal(got, want), (trial, k, n)


def test_hash_sample_fixed_is_exact_bottom_k(ray_session):
    """hash_sample_fixed must return EXACTLY the k keys with the
    smallest hashes (not merely k deterministic rows) — the property
    the IVF/k-means seeding relies on."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from raydedup.functions.minhash import _fmix64_batch
    from raydedup.util import hash_sample_fixed

    n, k, seed = 3000, 64, 0x5EED
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": pa.array(ids)})).repartition(7)
    got = sorted(r["id"] for r in hash_sample_fixed(ds, "id", k).take_all())
    h = _fmix64_batch(ids.view(np.uint64) ^ np.uint64(seed))
    want = sorted(ids[np.argsort(h)[:k]].tolist())
    assert got == want


def test_lcs_string_matches_brute_force():
    import itertools

    from raydedup.stages.suffix_span import lcs_string

    def brute(a, b):
        subs = {a[i:j] for i in range(len(a))
                for j in range(i + 1, len(a) + 1)}
        common = [s for s in subs if s in b]
        if not common:
            return ""
        m = max(len(s) for s in common)
        return min(s for s in common if len(s) == m)

    cases = [
        ("banana", "ananas"),
        ("abcXdef", "defYabc"),          # two maximal candidates, tie
        ("aaaa", "aa"),
        ("xyz", "pqr"),
        ("", "abc"),
        ("same", "same"),
        # NUL-bearing text: the match must not cross the sentinel
        ("ab", "ab\x00ab"),
        ("x\x00y", "x\x00y"),
        ("p\x00", "q\x00r"),
    ]
    import random
    rng = random.Random(7)
    for _ in range(40):
        a = "".join(rng.choice("abc") for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice("abc") for _ in range(rng.randint(0, 14)))
        cases.append((a, b))
    for a, b in cases:
        assert lcs_string(a, b) == brute(a, b), (a, b)
    # multibyte text: spans stay valid strings
    s = lcs_string("héllo wörld shared", "other héllo wörld tail")
    assert "héllo wörld" in s or s in "héllo wörld shared"


def test_remove_dup_spans_planted():
    from raydedup.stages.suffix_span import remove_dup_spans

    span = "S " * 150                     # 300 shared chars
    span2 = "Q " * 160
    rows = {
        "row_key": ["a:0", "b:0", "c:0", "d:0"],
        "text": [
            "unique prefix one " + span + "unique suffix one",
            "other beginning " + span + "different ending " + span2,
            "no duplicated content in this row at all, just filler",
            "yet another head " + span2 + "yet another tail",
        ],
    }
    ds = ray.data.from_arrow(pa.table(rows)).repartition(3)
    got = {r["row_key"]: r for r in
           remove_dup_spans(ds, DEFAULT_CONFIG).take_all()}
    assert set(got) == {"a:0", "b:0", "c:0", "d:0"}
    # smallest key keeps its text verbatim
    assert got["a:0"]["text"] == rows["text"][0]
    assert got["a:0"]["n_removed"] == 0
    assert got["c:0"]["text"] == rows["text"][2]
    # b lost the span shared with a; d lost the span shared with b
    assert span not in got["b:0"]["text"]
    assert got["b:0"]["n_removed"] > 0
    assert span2 not in got["d:0"]["text"]
    # removal cut only span content: lengths reconcile exactly
    for k in rows["row_key"]:
        orig = rows["text"][list(rows["row_key"]).index(k)]
        r = got[k]
        assert len(orig) - len(r["text"]) == r["n_removed"]

    # no pairs -> pure passthrough
    clean = ray.data.from_arrow(pa.table(
        {"row_key": ["x", "y"], "text": ["short one", "short two"]}))
    out = {r["row_key"]: r for r in
           remove_dup_spans(clean, DEFAULT_CONFIG).take_all()}
    assert out["x"]["text"] == "short one"
    assert out["x"]["n_removed"] == 0


def test_remove_dup_spans_no_resurrection():
    """A cut boundary that re-forms the span must be re-cut (the
    single-pass str.replace bug found in review)."""
    from raydedup.stages.suffix_span import remove_dup_spans

    keeper = "a" * 150 + "b" * 150
    victim = "a" * 300 + "b" * 300
    ds = ray.data.from_arrow(pa.table(
        {"row_key": ["k0", "k1"], "text": [keeper, victim]}))
    got = {r["row_key"]: r for r in
           remove_dup_spans(ds, DEFAULT_CONFIG).take_all()}
    assert got["k0"]["text"] == keeper
    assert keeper not in got["k1"]["text"]
    assert got["k1"]["n_removed"] == len(victim) - len(got["k1"]["text"])


def test_remove_dup_spans_multi_round():
    """One round removes one (longest) span per pair; rounds=2 catches a
    second disjoint shared span and reaches the fixpoint."""
    import pytest

    from raydedup.stages.suffix_span import remove_dup_spans

    s1 = "X" * 400
    s2 = "Y" * 250
    a = "head " + s1 + " mid " + s2 + " tail"
    b = "other " + s1 + " filler " + s2 + " end"
    ds = ray.data.from_arrow(pa.table(
        {"row_key": ["a", "b"], "text": [a, b]}))
    one = {r["row_key"]: r for r in
           remove_dup_spans(ds, DEFAULT_CONFIG, rounds=1).take_all()}
    assert s1 not in one["b"]["text"]
    assert s2 in one["b"]["text"]          # disjoint span survives r1
    two = {r["row_key"]: r for r in
           remove_dup_spans(ds, DEFAULT_CONFIG, rounds=3).take_all()}
    assert two["a"]["text"] == a
    assert s1 not in two["b"]["text"] and s2 not in two["b"]["text"]
    assert two["b"]["n_removed"] == len(b) - len(two["b"]["text"])

    with pytest.raises(ValueError, match="rounds"):
        remove_dup_spans(ds, DEFAULT_CONFIG, rounds=0)


def test_containment_pairs_planted(ray_session):
    """Planted snippet ⊂ doc detected with correct orientation; equal
    texts and too-short inners excluded; precision 1 by construction."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from raydedup.stages.suffix_span import containment_pairs

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    long1 = " ".join(rng.choice(words, 120))
    long2 = " ".join(rng.choice(words, 120))
    snippet = long1[30:130]          # 100 chars >= t_min 63
    tiny = long2[10:50]              # 40 chars < t_min, excluded as inner
    ds = ray.data.from_arrow(pa.table({
        "row_key": pa.array(["d1", "d2", "s1", "t1", "e1", "e2"],
                            pa.string()),
        "text": pa.array([long1, long2, snippet, tiny, long1, long1],
                         pa.string()),
    }))
    rows = containment_pairs(ds, k=16, window=48).take_all()
    got = {(r["inner_key"], r["outer_key"]) for r in rows}
    # s1 ⊂ d1 (and ⊂ the exact copies e1/e2); equal-text pairs
    # (d1,e1,e2) never appear; tiny never appears as inner
    assert ("s1", "d1") in got
    assert got == {("s1", "d1"), ("s1", "e1"), ("s1", "e2")}
    lens = {r["inner_key"]: r["inner_len"] for r in rows}
    assert lens["s1"] == len(snippet)


def test_containment_pairs_empty_schema(ray_session):
    import pyarrow as pa

    import ray.data
    from raydedup.stages.suffix_span import containment_pairs

    ds = ray.data.from_arrow(pa.table({
        "row_key": pa.array(["a", "b"], pa.string()),
        "text": pa.array(["completely different one " * 8,
                          "another unrelated body " * 8], pa.string()),
    }))
    out = containment_pairs(ds, k=16, window=48)
    assert set(out.schema().names) == {"inner_key", "outer_key",
                                       "inner_len"}
    assert out.count() == 0


def test_dhash_brightness_invariance_and_discrimination():
    import numpy as np

    from raydedup.stages.multimodal import dhash64

    rng = np.random.default_rng(7)
    img = rng.integers(0, 200, size=(23, 31, 3), dtype=np.int64)
    h0 = dhash64(img.astype(np.uint8))
    # uniform brightness shift (no clipping) leaves every bit unchanged
    assert dhash64((img + 37).astype(np.uint8)) == h0
    # a different random image lands elsewhere (seeded, deterministic)
    other = rng.integers(0, 200, size=(23, 31, 3), dtype=np.int64)
    assert dhash64(other.astype(np.uint8)) != h0
    # halves are non-negative and fit 32 bits each
    for half in h0:
        assert 0 <= half < (1 << 32)


def test_image_dup_groups_brightness_variants_cluster(ray_session):
    import pyarrow as pa

    import ray.data
    from raydedup.stages.multimodal import (
        attach_synthetic_image_variants,
        image_dup_groups,
    )

    n, groups = 120, 8
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))
    rows = image_dup_groups(
        attach_synthetic_image_variants(ds, groups=groups)).take_all()
    assert len(rows) == n
    for r in rows:
        # verified no cross-group dHash collisions at these params, so
        # the cluster is exactly the residue class: label = min id = g
        assert r["img_cluster"] == r["doc_id"] % groups
        assert r["n_members"] == n // groups
    # exactly one distinct hash per planted group
    assert len({(r["dhash_hi"], r["dhash_lo"]) for r in rows}) == groups


def test_image_near_dup_pairs_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from raydedup.stages.multimodal import (
        attach_synthetic_image_variants,
        decode_ppm,
        dhash64,
        encode_ppm,
        image_near_dup_pairs,
    )

    n, groups, spot_from, h_max = 160, 8, 4, 6
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))
    got = {(r["a_id"], r["b_id"]): r["hamming"]
           for r in image_near_dup_pairs(
               attach_synthetic_image_variants(
                   ds, groups=groups, spot_from=spot_from),
               hamming_max=h_max).take_all()}

    # brute force: hash every payload directly, reps = min id per hash,
    # all rep pairs with hamming <= h_max
    hashes = {}
    for d in range(n):
        g, v = d % groups, (d // groups) % 7
        w, h = 20 + g % 9, 20 + g % 7
        pix = ((np.int64(3 * g)
                + 5 * np.arange(3 * w * h, dtype=np.int64)) % 200 + v)
        if v >= spot_from:
            p0 = ((3 * h) // 8) * w + ((4 * w) // 9)
            pix[3 * p0: 3 * p0 + 3] = 255
        _, _, img = decode_ppm(encode_ppm(w, h, pix.astype(np.uint8)))
        hsh = dhash64(img)
        if hsh not in hashes or d < hashes[hsh]:
            hashes[hsh] = d
    reps = sorted((d, hsh) for hsh, d in hashes.items())
    want = {}
    for i, (da, ha) in enumerate(reps):
        for db, hb in reps[i + 1:]:
            ham = (bin(ha[0] ^ hb[0]).count("1")
                   + bin(ha[1] ^ hb[1]).count("1"))
            if ham <= h_max:
                want[(da, db)] = ham
    assert got == want
    assert want  # the planted perturbation produced at least one pair


def test_audio_fingerprint_amplitude_invariance():
    import numpy as np

    from raydedup.stages.multimodal import audio_fingerprint64

    rng = np.random.default_rng(11)
    s = rng.integers(-4000, 4000, size=64 * 33, dtype=np.int64)
    f0 = audio_fingerprint64(s.astype(np.int16))
    # volume change (positive scale, no clipping) leaves every bit
    assert audio_fingerprint64((s * 5).astype(np.int16)) == f0
    other = rng.integers(-4000, 4000, size=64 * 33, dtype=np.int64)
    assert audio_fingerprint64(other.astype(np.int16)) != f0
    assert 0 <= f0 < (1 << 32)


def test_audio_dup_groups_volume_variants_cluster(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from raydedup.stages.multimodal import (
        attach_synthetic_audio_variants,
        audio_dup_groups,
        audio_fingerprint64,
    )

    n, groups = 120, 8
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))
    rows = audio_dup_groups(
        attach_synthetic_audio_variants(ds, groups=groups)).take_all()
    assert len(rows) == n

    # brute force: generate + fingerprint directly, then min-id labels
    t = np.arange(64 * 33, dtype=np.int64)
    fps = {}
    for d in range(n):
        g, v = d % groups, (d // groups) % 7
        step, mod = 3 + g % 11, 1024 + 37 * g
        s = (((13 * g + step * t) % mod) - mod // 2) * (1 + v)
        fps[d] = audio_fingerprint64(s.astype(np.int16))
    label = {d: min(e for e in fps if fps[e] == fps[d]) for d in fps}
    members = {d: sum(1 for e in fps if fps[e] == fps[d]) for d in fps}
    for r in rows:
        assert r["afp"] == fps[r["doc_id"]]
        assert r["audio_cluster"] == label[r["doc_id"]]
        assert r["n_members"] == members[r["doc_id"]]
    # volume variants collapsed: every group clusters to one label
    assert all(label[d] == label[d % groups] for d in range(n))


def test_video_dup_groups_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from raydedup.stages.multimodal import (
        attach_synthetic_video_variants,
        decode_avi,
        dhash64,
        encode_avi,
        video_dup_groups,
    )

    n, groups = 120, 8
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))
    rows = video_dup_groups(
        attach_synthetic_video_variants(ds, groups=groups)).take_all()
    assert len(rows) == n

    # brute force: regenerate, decode, per-frame dHash, ordered key
    keys = {}
    for d in range(n):
        g, v = d % groups, (d // groups) % 7
        w, h, nf = 16 + g % 9, 16 + g % 7, 2 + g % 3
        frames = [((np.int64(7 * g + 11 * f)
                    + 5 * np.arange(3 * w * h, dtype=np.int64)) % 200 + v)
                  for f in range(nf)]
        _, _, dec = decode_avi(encode_avi(w, h, frames))
        keys[d] = ";".join(
            "{}:{}".format(*dhash64(fr)) for fr in dec)
    label = {d: min(e for e in keys if keys[e] == keys[d]) for d in keys}
    for r in rows:
        assert r["vhash"] == keys[r["doc_id"]]
        assert r["video_cluster"] == label[r["doc_id"]]
    # brightness variants collapsed into their group's cluster
    assert all(label[d] == label[d % groups] for d in range(n))
    # and the planted groups are mutually distinct at these params
    assert len(set(label.values())) == groups


def test_image_near_dup_clusters_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from raydedup.stages.multimodal import (
        attach_synthetic_image_variants,
        decode_ppm,
        dhash64,
        encode_ppm,
        image_near_dup_clusters,
    )

    n, groups, spot_from, h_max = 160, 8, 4, 6
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))
    got = {r["doc_id"]: r["img_cluster"]
           for r in image_near_dup_clusters(
               attach_synthetic_image_variants(
                   ds, groups=groups, spot_from=spot_from),
               hamming_max=h_max).take_all()}
    assert len(got) == n

    # brute force: hash -> rep -> union-find over hamming<=h rep pairs
    hashes = {}
    for d in range(n):
        g, v = d % groups, (d // groups) % 7
        w, h = 20 + g % 9, 20 + g % 7
        pix = ((np.int64(3 * g)
                + 5 * np.arange(3 * w * h, dtype=np.int64)) % 200 + v)
        if v >= spot_from:
            p0 = ((3 * h) // 8) * w + ((4 * w) // 9)
            pix[3 * p0: 3 * p0 + 3] = 255
        _, _, img = decode_ppm(encode_ppm(w, h, pix.astype(np.uint8)))
        hashes[d] = dhash64(img)
    rep = {}
    for d in range(n):
        rep.setdefault(hashes[d], d)
    parent = {r: r for r in rep.values()}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    rs = sorted(rep.items())
    for i, (ha, da) in enumerate(rs):
        for hb, db in rs[i + 1:]:
            ham = (bin(ha[0] ^ hb[0]).count("1")
                   + bin(ha[1] ^ hb[1]).count("1"))
            if ham <= h_max:
                ra, rb = find(da), find(db)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    for d in range(n):
        assert got[d] == find(rep[hashes[d]])
    # the near tier merged at least one pair of distinct-hash groups
    assert len(set(got.values())) < len(rep)


def test_dhash_stack_matches_scalar():
    import numpy as np

    from raydedup.stages.multimodal import dhash64, dhash64_stack

    rng = np.random.default_rng(23)
    imgs = rng.integers(0, 256, size=(17, 21, 29, 3), dtype=np.int64
                        ).astype(np.uint8)
    hi, lo = dhash64_stack(imgs)
    for i in range(imgs.shape[0]):
        assert (int(hi[i]), int(lo[i])) == dhash64(imgs[i])


def test_audio_fingerprint_stack_matches_scalar():
    import numpy as np

    from raydedup.stages.multimodal import (
        audio_fingerprint64,
        audio_fingerprint64_stack,
    )

    rng = np.random.default_rng(31)
    stack = rng.integers(-30000, 30000, size=(9, 64 * 33 + 17),
                         dtype=np.int64).astype(np.int16)
    got = audio_fingerprint64_stack(stack)
    for i in range(stack.shape[0]):
        assert int(got[i]) == audio_fingerprint64(stack[i])


def test_audio_near_dup_pairs_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from raydedup.stages.multimodal import (
        attach_synthetic_audio_variants,
        audio_fingerprint64,
        audio_near_dup_pairs,
        decode_wav,
        encode_wav,
    )

    n, groups, spike_from, h_max, nf = 280, 8, 4, 4, 64
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))
    got = {(r["a_id"], r["b_id"]): r["hamming"]
           for r in audio_near_dup_pairs(
               attach_synthetic_audio_variants(
                   ds, groups=groups, n_frames=nf, spike_from=spike_from),
               hamming_max=h_max).take_all()}

    # brute force through the SAME wav round-trip the actor pool takes
    fps = {}
    t = np.arange(64 * nf, dtype=np.int64)
    for d in range(n):
        g, v = d % groups, (d // groups) % 7
        step, mod = 3 + g % 11, 1024 + 37 * g
        s = (((13 * g + step * t) % mod) - mod // 2) * (1 + v)
        if v >= spike_from:
            k = 1 + g % (nf - 2)
            s[k * 64: (k + 1) * 64] *= 2
        _, _, dec = decode_wav(encode_wav(8000, s.astype(np.int16)))
        fp = audio_fingerprint64(dec)
        if fp not in fps or d < fps[fp]:
            fps[fp] = d
    reps = sorted((d, fp) for fp, d in fps.items())
    want = {}
    for i, (da, fa) in enumerate(reps):
        for db, fb in reps[i + 1:]:
            ham = bin(fa ^ fb).count("1")
            if ham <= h_max:
                want[(da, db)] = ham
    assert got == want
    # the planted loudness burst produced genuine NEAR pairs (hamming
    # in 1..h_max), not only identical-fingerprint collapses
    assert any(0 < h <= h_max for h in want.values())


def test_audio_near_dup_clusters_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from raydedup.stages.multimodal import (
        attach_synthetic_audio_variants,
        audio_fingerprint64,
        audio_near_dup_clusters,
    )

    n, groups, spike_from, h_max, nf = 280, 8, 4, 4, 64
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))
    got = {r["doc_id"]: r["audio_cluster"]
           for r in audio_near_dup_clusters(
               attach_synthetic_audio_variants(
                   ds, groups=groups, n_frames=nf, spike_from=spike_from),
               hamming_max=h_max).take_all()}

    t = np.arange(64 * nf, dtype=np.int64)
    fp_of = {}
    for d in range(n):
        g, v = d % groups, (d // groups) % 7
        step, mod = 3 + g % 11, 1024 + 37 * g
        s = (((13 * g + step * t) % mod) - mod // 2) * (1 + v)
        if v >= spike_from:
            k = 1 + g % (nf - 2)
            s[k * 64: (k + 1) * 64] *= 2
        fp_of[d] = audio_fingerprint64(s.astype(np.int16))
    reps = {}
    for d, fp in fp_of.items():
        if fp not in reps or d < reps[fp]:
            reps[fp] = d
    rl = sorted(reps.values())
    lab = {r: r for r in rl}

    def root(x):
        while lab[x] != x:
            x = lab[x]
        return x

    for i, a in enumerate(rl):
        for b in rl[i + 1:]:
            if bin(fp_of[a] ^ fp_of[b]).count("1") <= h_max:
                ra, rb = root(a), root(b)
                if ra != rb:
                    lab[max(ra, rb)] = min(ra, rb)
    want = {d: root(reps[fp_of[d]]) for d in range(n)}
    assert got == want
    # near edges actually merged at least two distinct-fingerprint reps
    assert len(set(want.values())) < len(rl)


def test_video_near_dup_pairs_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from raydedup.stages.multimodal import (
        attach_synthetic_video_variants,
        dhash64,
        video_near_dup_pairs,
    )

    n, groups, recut_from, thr = 280, 8, 4, 0.5
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))
    rows = video_near_dup_pairs(
        attach_synthetic_video_variants(ds, groups=groups,
                                        recut_from=recut_from),
        threshold=thr).take_all()
    got = {(r["a_id"], r["b_id"]): (r["common"], r["na"], r["nb"])
           for r in rows}
    for r in rows:
        assert abs(r["jaccard"]
                   - r["common"] / (r["na"] + r["nb"] - r["common"])) < 1e-12

    # brute force: ordered-hash key per doc, rep per distinct key,
    # frame-SET jaccard over reps
    vh = {}
    for d in range(n):
        g, v = d % groups, (d // groups) % 7
        w, h, nf = 16 + g % 9, 16 + g % 7, 2 + g % 3
        frames = [((np.int64(7 * g + 11 * f)
                    + 5 * np.arange(3 * w * h, dtype=np.int64)) % 200 + v)
                  for f in range(nf)]
        if v == recut_from:
            frames = frames[::-1]
        elif v > recut_from:
            frames = frames[:-1]
        hs = []
        for fr in frames:
            hi, lo = dhash64(fr.reshape(h, w, 3).astype(np.uint8))
            hs.append((int(hi) << 32) | int(lo))
        vh[d] = tuple(hs)
    reps = {}
    for d, key in vh.items():
        if key not in reps or d < reps[key]:
            reps[key] = d
    rl = sorted(reps.values())
    want = {}
    for i, a in enumerate(rl):
        for b in rl[i + 1:]:
            sa, sb = set(vh[a]), set(vh[b])
            c, u = len(sa & sb), len(sa | sb)
            if u and c / u >= thr:
                want[(a, b)] = (c, len(sa), len(sb))
    assert got == want
    # both planted structures present: a reversed cut (jaccard 1.0)
    # and a trimmed cut (jaccard < 1.0)
    js = [c / (na + nb - c) for c, na, nb in want.values()]
    assert any(j == 1.0 for j in js) and any(j < 1.0 for j in js)


def test_multimodal_dup_clusters_matches_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data
    from raydedup.stages.multimodal import (
        attach_synthetic_audio_variants,
        attach_synthetic_image_variants,
        attach_synthetic_video_variants,
        audio_fingerprint64,
        audio_near_dup_clusters,
        dhash64,
        image_near_dup_clusters,
        video_dup_groups,
        video_near_dup_pairs,
    )
    from raydedup.state.unionfind import merge_components

    # mirror q_multimodal_dup_clusters's composition on a small corpus
    n, groups = 280, 8
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(n))}))

    def pad2(b, a, c, na, nc):
        return pa.table({
            na: pa.array([f"{int(x):020d}" for x in b[a].to_pylist()]),
            nc: pa.array([f"{int(x):020d}" for x in b[c].to_pylist()]),
        })

    img = image_near_dup_clusters(
        attach_synthetic_image_variants(ds, groups=groups, spot_from=4),
        hamming_max=6)
    labels = img.map_batches(
        lambda b: pad2(b, "doc_id", "img_cluster", "node", "label"),
        batch_format="pyarrow")
    aud = audio_near_dup_clusters(
        attach_synthetic_audio_variants(ds, groups=groups, n_frames=64,
                                        spike_from=4),
        hamming_max=4).map_batches(
        lambda b: pad2(b, "doc_id", "audio_cluster", "a_key", "b_key"),
        batch_format="pyarrow")
    vid = video_dup_groups(
        attach_synthetic_video_variants(ds, groups=groups,
                                        recut_from=4)).map_batches(
        lambda b: pad2(b, "doc_id", "video_cluster", "a_key", "b_key"),
        batch_format="pyarrow")
    vpairs = video_near_dup_pairs(
        attach_synthetic_video_variants(ds, groups=groups, recut_from=4),
        threshold=0.5).map_batches(
        lambda b: pad2(b, "a_id", "b_id", "a_key", "b_key"),
        batch_format="pyarrow")
    # one contraction over the union of families (the query's shape)
    merged = merge_components(labels, aud.union(vid).union(vpairs))
    got = {int(r["node"]): int(r["label"]) for r in merged.take_all()}

    # brute force: all six evidence families -> one union-find
    lab = list(range(n))

    def root(x):
        while lab[x] != x:
            x = lab[x]
        return x

    def union(a, b):
        ra, rb = root(a), root(b)
        if ra != rb:
            lab[max(ra, rb)] = min(ra, rb)

    ih, af, vh = {}, {}, {}
    for d in range(n):
        g, v = d % groups, (d // groups) % 7
        w, h = 20 + g % 9, 20 + g % 7
        pix = ((np.int64(3 * g)
                + 5 * np.arange(3 * w * h, dtype=np.int64)) % 200 + v)
        if v >= 4:
            p0 = ((3 * h) // 8) * w + ((4 * w) // 9)
            pix[3 * p0: 3 * p0 + 3] = 255
        ih[d] = dhash64(pix.reshape(h, w, 3).astype(np.uint8))
        step, mod = 3 + g % 11, 1024 + 37 * g
        t = np.arange(64 * 64, dtype=np.int64)
        s = (((13 * g + step * t) % mod) - mod // 2) * (1 + v)
        if v >= 4:
            k = 1 + g % 62
            s[k * 64: (k + 1) * 64] *= 2
        af[d] = audio_fingerprint64(s.astype(np.int16))
        w2, h2, nf = 16 + g % 9, 16 + g % 7, 2 + g % 3
        frames = [((np.int64(7 * g + 11 * f)
                    + 5 * np.arange(3 * w2 * h2, dtype=np.int64))
                   % 200 + v) for f in range(nf)]
        if v == 4:
            frames = frames[::-1]
        elif v > 4:
            frames = frames[:-1]
        vh[d] = tuple((int(hi) << 32) | int(lo) for hi, lo in
                      (dhash64(fr.reshape(h2, w2, 3).astype(np.uint8))
                       for fr in frames))

    def family(keys_of, near):
        reps = {}
        for d in range(n):
            k = keys_of[d]
            if k not in reps or d < reps[k]:
                reps[k] = d
        for d in range(n):
            union(d, reps[keys_of[d]])
        rl = sorted(reps.values())
        for i, a in enumerate(rl):
            for b in rl[i + 1:]:
                if near(keys_of[a], keys_of[b]):
                    union(a, b)

    family(ih, lambda a, b: bin(a[0] ^ b[0]).count("1")
           + bin(a[1] ^ b[1]).count("1") <= 6)
    family(af, lambda a, b: bin(a ^ b).count("1") <= 4)

    def vnear(a, b):
        sa, sb = set(a), set(b)
        u = len(sa | sb)
        return u > 0 and len(sa & sb) / u >= 0.5

    family(vh, vnear)
    want = {d: root(d) for d in range(n)}
    assert got == want
    # the union is a COARSENING of each single modality: two docs an
    # individual modality merged are never split by the union
    img_only = {r["doc_id"]: r["img_cluster"] for r in img.take_all()}
    mod_to_mm = {}
    for d in range(n):
        prev = mod_to_mm.setdefault(img_only[d], want[d])
        assert prev == want[d]
    assert len(set(want.values())) <= len(set(img_only.values()))


def test_audio_window_fingerprints_trim_subset():
    """Kernel contract: a frame-aligned trim of k leading frames keeps
    the delta-bit SUFFIX intact, so the trimmed clip's window-word set
    is a subset of the untrimmed clip's — the invariance that makes the
    constellation tier shift-robust where the packed 64-bit
    fingerprint's hamming is scrambled by any shift."""
    import numpy as np

    from raydedup.stages.multimodal import (
        audio_fingerprint64,
        audio_window_fingerprints,
    )

    g = 3
    x = np.arange(0, 64, dtype=np.int64) + 64 * g
    h = (x * 2654435761) % (1 << 31)
    h = ((h ^ (h >> 15)) * 2246822519) % (1 << 31)
    lvl = (h ^ (h >> 13)) % 4000
    full = np.repeat(lvl, 64).astype(np.int16)
    for k in (1, 3, 6):
        trimmed = np.repeat(lvl[k:] * 2, 64).astype(np.int16)  # + volume
        wt, bt = audio_window_fingerprints(trimmed)
        wf, bf = audio_window_fingerprints(full)
        assert np.array_equal(bt, bf[k:])       # bit stream = suffix
        assert set(wt.tolist()) <= set(wf.tolist())
        assert wt.size >= wf.size - k           # only leading windows lost
        # the packed single fingerprint is NOT shift-robust: hamming
        # between full and trimmed is large (every bit position moved)
        fp_full = audio_fingerprint64(full)
        fp_trim = audio_fingerprint64(trimmed)
        assert bin(fp_full ^ fp_trim).count("1") > 6


def test_audio_shift_near_dup_pairs_planted(ray_session):
    """Planted trim+volume corpus: every in-group variant pair (21 per
    group — all trims of one recording) is found at Jaccard >= 0.6 and
    NO cross-group pair appears; exact-duplicate ids (d and d+280 share
    (g, v)) collapse to one representative first."""
    import collections

    import pyarrow as pa
    import ray.data

    from raydedup.stages.multimodal import (
        attach_synthetic_audio_trims,
        audio_shift_near_dup_pairs,
    )

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(560)), pa.int64())}))
    pairs = audio_shift_near_dup_pairs(
        attach_synthetic_audio_trims(docs), threshold=0.6).take_all()
    assert len(pairs) == 40 * 21
    by_group = collections.Counter()
    for r in pairs:
        assert r["a_id"] % 40 == r["b_id"] % 40, r  # no cross-group
        assert r["a_id"] < 280 and r["b_id"] < 280  # reps are min ids
        assert r["jaccard"] >= 0.6
        by_group[r["a_id"] % 40] += 1
    assert all(v == 21 for v in by_group.values())
