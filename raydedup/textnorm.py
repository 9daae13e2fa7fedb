"""Deterministic text normalization: tokenizer, Porter stemmer, stopwords,
shingling.

This is the new engine's frozen re-specification of the reference's
``full_tokenize`` (otmt/timemap_measures.py:45-62): word-tokenize, Porter-stem
every token, drop English stopwords and punctuation. The reference uses
nltk's ``word_tokenize`` + ``PorterStemmer`` + corpus stopwords; those are not
available here, so the engine pins its own deterministic equivalents:

- tokenizer: ``\\w+`` regex runs over the raw text (no lowercasing before
  stemming — the nltk stemmer lowercases internally, and so does ours);
- stemmer: the classic Porter (1980) algorithm implemented from the published
  description (M.F. Porter, "An algorithm for suffix stripping", Program
  14(3):130-137 — public domain algorithm). NOTE: nltk ships an "extended"
  Porter variant; golden values in our tests are generated against THIS
  implementation, which is the engine's frozen contract.
- stopwords: the standard English stopword list (the same 179-word public
  list nltk distributes), plus ASCII punctuation (mirrors
  ``stopwords.words("english") + list(string.punctuation)``,
  otmt/timemap_measures.py:52). Like the reference, the stopword filter is
  applied AFTER stemming (faithful quirk — stems like "veri" never match
  the un-stemmed stopword list entries such as "very").

Everything here is a pure function of (text, config) — no global state, no
randomness — so any worker on any node computes identical outputs.
"""

from __future__ import annotations

import re
import string
from functools import lru_cache

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# Standard public English stopword list (as distributed with nltk's corpus).
STOPWORDS = frozenset("""
i me my myself we our ours ourselves you you're you've you'll you'd your
yours yourself yourselves he him his himself she she's her hers herself it
it's its itself they them their theirs themselves what which who whom this
that that'll these those am is are was were be been being have has had
having do does did doing a an the and but if or because as until while of
at by for with about against between into through during before after
above below to from up down in out on off over under again further then
once here there when where why how all any both each few more most other
some such no nor not only own same so than too very s t can will just don
don't should should've now d ll m o re ve y ain aren aren't couldn
couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven haven't
isn isn't ma mightn mightn't mustn mustn't needn needn't shan shan't
shouldn shouldn't wasn wasn't weren weren't won won't wouldn wouldn't
""".split())

STOPSET = STOPWORDS | frozenset(string.punctuation)

_VOWELS = frozenset("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m(): number of VC sequences in the stem."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_consonant(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


@lru_cache(maxsize=1 << 18)
def porter_stem(word: str) -> str:
    """Classic Porter stemmer. Lowercases its input (as nltk's does)."""
    w = word.lower()
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _contains_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _contains_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_consonant(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _contains_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suffix, repl in _STEP2:
        if w.endswith(suffix):
            stem = w[: -len(suffix)]
            if _measure(stem) > 0:
                w = stem + repl
            break

    # Step 3
    for suffix, repl in _STEP3:
        if w.endswith(suffix):
            stem = w[: -len(suffix)]
            if _measure(stem) > 0:
                w = stem + repl
            break

    # Step 4
    for suffix in _STEP4:
        if w.endswith(suffix):
            stem = w[: -len(suffix)]
            if suffix == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem

    # Step 5b
    if w.endswith("ll") and _measure(w) > 1:
        w = w[:-1]

    return w


def word_tokenize(text: str) -> list[str]:
    """``\\w+`` runs of the raw text (engine's frozen tokenizer)."""
    return _WORD_RE.findall(text)


def full_tokenize(text: str, stemming: bool = True,
                  remove_stopwords: bool = True,
                  stem_cache: dict | None = None) -> list[str]:
    """Engine re-spec of otmt full_tokenize (timemap_measures.py:45-62):
    tokenize → stem each token → drop stopwords/punctuation (filter applied
    after stemming, like the reference).

    ``stem_cache`` (token → stem) amortizes the pure-Python Porter pass:
    corpus token instances repeat massively (Zipf), so a persistent
    per-worker dict turns ~3 µs of stemming into one dict probe for all
    but first-seen tokens. Stemming is a pure function of the token, so
    the cache cannot change results."""
    tokens = word_tokenize(text)
    if stemming:
        if stem_cache is None:
            tokens = [porter_stem(t) for t in tokens]
        else:
            get = stem_cache.get
            out = []
            for t in tokens:
                s = get(t)
                if s is None:
                    s = porter_stem(t)
                    stem_cache[t] = s
                out.append(s)
            tokens = out
    else:
        tokens = [t.lower() for t in tokens]
    if remove_stopwords:
        tokens = [t for t in tokens if t not in STOPSET]
    return tokens


def simple_tokenize(text: str) -> list[str]:
    """Lowercase ``\\w+`` tokens with NO stemming/stopwording.

    The SQL-mirrorable tokenizer: DuckDB expresses it exactly as
    ``regexp_extract_all(lower(text), '[0-9a-z_]+')`` for ASCII text, which
    keeps the Ray pipeline and the DuckDB oracle in lockstep.
    """
    return _WORD_RE.findall(text.lower())


def word_shingles(tokens: list[str], w: int) -> list[str]:
    """w-word shingles joined by a single space; a doc shorter than w words
    yields one shingle of all its words ('' for an empty doc)."""
    if len(tokens) <= w:
        return [" ".join(tokens)]
    return [" ".join(tokens[i : i + w]) for i in range(len(tokens) - w + 1)]


# --- Simhash preprocessing (parity with the `simhash` library defaults the
# reference relies on at otmt/metadata_calcluations.py:56-58) ---

_SIMHASH_KEEP_RE = re.compile(r"[\w一-鿌]+", re.UNICODE)


def simhash_preprocess(text: str) -> str:
    """lowercase + strip everything but word chars (library-default)."""
    return "".join(_SIMHASH_KEEP_RE.findall(text.lower()))


def char_shingles(content: str, width: int) -> list[str]:
    """Width-``width`` sliding character shingles of preprocessed content;
    always yields at least one (possibly short/empty) shingle — the
    library's ``max(len - width + 1, 1)`` slide rule."""
    n = max(len(content) - width + 1, 1)
    return [content[i : i + width] for i in range(n)]
