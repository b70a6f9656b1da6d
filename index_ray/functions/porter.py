"""Porter suffix-stripping stemmer — the published 1980 algorithm.

The reference vendors a Porter implementation (``/root/reference/stemmer/
stemmer.cpp:115-453``) but its call sites are commented out and the
pass-by-value signatures make it a no-op (SURVEY.md App. C), so this module
implements the *published* algorithm the reference cites
(``stemmer/stemmer.cpp:422`` credits "Porter's stemmer algorithm") and our
golden tests pin these semantics.

Faithful to M.F. Porter, "An algorithm for suffix stripping", Program 14(3)
1980: steps 1a, 1b (+cleanup), 1c, 2, 3, 4, 5a, 5b, longest-matching-suffix
rule per step, conditions on the measure *m* of the stem.  Words of length
<= 2 are returned unchanged (standard behavior of Porter's own
implementation).

Per-process memoization via ``stem_cached`` — call it from actor/task code
so each worker stems a token string once per vocabulary entry, not once per
occurrence.
"""

from __future__ import annotations

import functools

_VOWELS = frozenset("aeiou")


def _cons_flags(w: str) -> list[bool]:
    """flags[i] is True iff w[i] is a consonant per Porter's definition."""
    flags: list[bool] = []
    for i, c in enumerate(w):
        if c in _VOWELS:
            flags.append(False)
        elif c == "y":
            flags.append(True if i == 0 else not flags[i - 1])
        else:
            flags.append(True)
    return flags


def _measure(w: str) -> int:
    """m in [C](VC)^m[V]: number of vowel->consonant transitions."""
    flags = _cons_flags(w)
    m = 0
    for i in range(1, len(flags)):
        if flags[i] and not flags[i - 1]:
            m += 1
    return m


def _contains_vowel(w: str) -> bool:
    return not all(_cons_flags(w))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons_flags(w)[-1]


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    f = _cons_flags(w)
    return f[-3] and not f[-2] and f[-1] and w[-1] not in "wxy"


# (suffix -> replacement) rule tables; longest matching suffix wins,
# and once a suffix matches, the step ends whether or not the m-condition
# allowed the rewrite (Porter's single-rule-per-step semantics).
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
_STEP2.sort(key=lambda r: -len(r[0]))
_STEP3.sort(key=lambda r: -len(r[0]))
_STEP4.sort(key=len, reverse=True)


def step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def step1b(w: str) -> str:
    cleanup = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _contains_vowel(w[:-2]):
        w = w[:-2]
        cleanup = True
    elif w.endswith("ing") and _contains_vowel(w[:-3]):
        w = w[:-3]
        cleanup = True
    if cleanup:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"
    return w


def step1c(w: str) -> str:
    if w.endswith("y") and _contains_vowel(w[:-1]):
        return w[:-1] + "i"
    return w


def step2(w: str) -> str:
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem_ = w[: -len(suf)]
            if _measure(stem_) > 0:
                return stem_ + rep
            return w
    return w


def step3(w: str) -> str:
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem_ = w[: -len(suf)]
            if _measure(stem_) > 0:
                return stem_ + rep
            return w
    return w


def step4(w: str) -> str:
    for suf in _STEP4:
        if w.endswith(suf):
            stem_ = w[: -len(suf)]
            if _measure(stem_) > 1 and (suf != "ion" or stem_.endswith(("s", "t"))):
                return stem_
            return w
    return w


def step5a(w: str) -> str:
    if w.endswith("e"):
        a = w[:-1]
        m = _measure(a)
        if m > 1 or (m == 1 and not _ends_cvc(a)):
            return a
    return w


def step5b(w: str) -> str:
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        return w[:-1]
    return w


def stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    for step in (step1a, step1b, step1c, step2, step3, step4, step5a, step5b):
        w = step(w)
    return w


stem_cached = functools.lru_cache(maxsize=1 << 20)(stem)
