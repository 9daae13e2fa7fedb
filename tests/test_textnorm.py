"""Tokenizer / Porter stemmer / shingling unit tests.

Porter goldens are the examples from M.F. Porter, "An algorithm for suffix
stripping" (1980) run through the FULL algorithm (steps compose — e.g.
'electrical' passes step 3 ical→ic and then step 4 strips 'ic', giving
'electr'; the paper's per-step examples show single steps only)."""

from raydedup.textnorm import (
    char_shingles,
    full_tokenize,
    porter_stem,
    simple_tokenize,
    simhash_preprocess,
    word_shingles,
    word_tokenize,
)

PORTER_GOLDENS = {
    "caresses": "caress", "ponies": "poni", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "sized": "size", "hopping": "hop", "falling": "fall",
    "hissing": "hiss", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "effective": "effect",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    # full-algorithm compositions
    "electrical": "electr", "generalization": "gener", "oscillators": "oscil",
}


def test_porter_goldens():
    for w, expected in PORTER_GOLDENS.items():
        assert porter_stem(w) == expected, w


def test_porter_lowercases():
    assert porter_stem("Running") == porter_stem("running") == "run"


def test_full_tokenize_stems_and_drops_stopwords():
    toks = full_tokenize("The quick brown foxes were jumping over the lazy dogs!")
    assert "the" not in toks and "were" not in toks
    assert "fox" in toks and "jump" in toks and "dog" in toks


def test_stopword_filter_applied_after_stemming():
    # 'very' stems to 'veri', which is NOT in the stopword list —
    # the reference's post-stem filtering quirk (timemap_measures.py:62)
    assert "veri" in full_tokenize("very very interesting")


def test_word_tokenize_and_simple():
    assert word_tokenize("a-b c_d 1.5") == ["a", "b", "c_d", "1", "5"]
    assert simple_tokenize("Hello WORLD") == ["hello", "world"]


def test_word_shingles():
    assert word_shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert word_shingles(["a", "b"], 3) == ["a b"]
    assert word_shingles([], 3) == [""]


def test_char_shingles_slide_rule():
    assert char_shingles("abcdef", 4) == ["abcd", "bcde", "cdef"]
    # max(len - w + 1, 1) rule: short strings yield one short shingle
    assert char_shingles("ab", 4) == ["ab"]
    assert char_shingles("", 4) == [""]


def test_simhash_preprocess():
    assert simhash_preprocess("Hello, World! 42") == "helloworld42"


def test_full_tokenize_stem_cache_parity():
    """The persistent stem cache must be invisible: identical output to
    the uncached path over a token-repeating corpus, and the cache must
    actually fill (one entry per distinct token)."""
    import random

    from raydedup.textnorm import full_tokenize

    rng = random.Random(2)
    words = ["running", "jumped", "cats", "happily", "the", "very",
             "nationalization", "agreed", "ponies", "caresses"]
    texts = [" ".join(rng.choice(words) for _ in range(30))
             for _ in range(50)]
    cache: dict = {}
    for t in texts:
        assert (full_tokenize(t, stem_cache=cache)
                == full_tokenize(t))
        assert (full_tokenize(t, stemming=False, stem_cache=cache)
                == full_tokenize(t, stemming=False))
    assert set(cache) == set(words)
