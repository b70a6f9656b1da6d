"""Porter stemmer vs. the examples published in Porter (1980).

The paper gives *per-step* input/output pairs, so each step function is
tested against its own examples; a handful of full-pipeline chains are
pinned separately.
"""

from index_ray.functions import porter
from index_ray.functions.porter import stem

STEP_EXAMPLES = {
    porter.step1a: [
        ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
        ("caress", "caress"), ("cats", "cat"),
    ],
    porter.step1b: [
        ("feed", "feed"), ("agreed", "agree"), ("plastered", "plaster"),
        ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
        ("conflated", "conflate"), ("troubled", "trouble"), ("sized", "size"),
        ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
        ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
        ("filing", "file"),
    ],
    porter.step1c: [("happy", "happi"), ("sky", "sky")],
    porter.step2: [
        ("relational", "relate"), ("conditional", "condition"),
        ("rational", "rational"), ("valenci", "valence"),
        ("hesitanci", "hesitance"), ("digitizer", "digitize"),
        ("conformabli", "conformable"), ("radicalli", "radical"),
        ("differentli", "different"), ("vileli", "vile"),
        ("analogousli", "analogous"), ("vietnamization", "vietnamize"),
        ("predication", "predicate"), ("operator", "operate"),
        ("feudalism", "feudal"), ("decisiveness", "decisive"),
        ("hopefulness", "hopeful"), ("callousness", "callous"),
        ("formaliti", "formal"), ("sensitiviti", "sensitive"),
        ("sensibiliti", "sensible"),
    ],
    porter.step3: [
        ("triplicate", "triplic"), ("formative", "form"),
        ("formalize", "formal"), ("electriciti", "electric"),
        ("electrical", "electric"), ("hopeful", "hope"),
        ("goodness", "good"),
    ],
    porter.step4: [
        ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
        ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
        ("adjustable", "adjust"), ("defensible", "defens"),
        ("irritant", "irrit"), ("replacement", "replac"),
        ("adjustment", "adjust"), ("dependent", "depend"),
        ("adoption", "adopt"), ("homologou", "homolog"),
        ("communism", "commun"), ("activate", "activ"),
        ("angulariti", "angular"), ("homologous", "homolog"),
        ("effective", "effect"), ("bowdlerize", "bowdler"),
    ],
    porter.step5a: [
        ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ],
    porter.step5b: [("controll", "control"), ("roll", "roll")],
}


def test_paper_step_examples():
    bad = []
    for step, pairs in STEP_EXAMPLES.items():
        for w, exp in pairs:
            got = step(w)
            if got != exp:
                bad.append((step.__name__, w, got, exp))
    assert not bad, bad


def test_full_chains():
    # full-pipeline results derivable directly from the paper's rules
    assert stem("connection") == "connect"
    assert stem("connections") == "connect"
    assert stem("connected") == "connect"
    assert stem("connecting") == "connect"
    assert stem("conditional") == "condit"
    assert stem("rational") == "ration"
    assert stem("agreed") == "agre"
    assert stem("troubles") == "troubl"
    assert stem("cats") == "cat"
    assert stem("caresses") == "caress"
    assert stem("tokenizer") == "token"
    assert stem("normalization") == "normal"


def test_short_words_unchanged():
    for w in ("a", "is", "be", "on", "", "i"):
        assert stem(w) == w


def test_identifier_ish_tokens_dont_crash():
    for w in ("snake_case", "x86", "utf8", "foo_bar_baz", "int32", "yyyy"):
        assert isinstance(stem(w), str)


def test_cached_matches_uncached():
    for w in ("running", "connection", "files", "trees"):
        assert porter.stem_cached(w) == stem(w)
