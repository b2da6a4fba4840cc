"""Porter2 stemmer golden vectors (publicly documented Snowball outputs)."""

from awesome_spark_search.stemmer import stem

GOLDEN = {
    # plurals / 1a
    "caresses": "caress", "ponies": "poni", "ties": "tie", "caress": "caress",
    "cats": "cat", "skis": "ski", "skies": "sky",
    # 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "meeting": "meet",
    # 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "generously": "generous", "fairly": "fair",
    # step 3
    "triplicate": "triplic", "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "national": "nation",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas", "controll": "control",
    "roll": "roll",
    # exceptions
    "dying": "die", "lying": "lie", "tying": "tie", "news": "news",
    "early": "earli", "only": "onli", "proceed": "proceed", "exceed": "exceed",
    "succeed": "succeed", "inning": "inning", "outing": "outing",
    "canning": "canning", "herring": "herring", "earring": "earring",
    # code-ish vocabulary used by the synthetic corpus
    "running": "run", "runs": "run", "merge": "merg", "merging": "merg",
    "merged": "merg", "buffer": "buffer", "buffers": "buffer",
    "scanning": "scan", "scanned": "scan", "scan": "scan",
    "indexes": "index", "indexing": "index", "compression": "compress",
    "tokenize": "token", "generate": "generat",
    # short words unchanged
    "a": "a", "is": "is", "be": "be",
}


def test_golden_vectors():
    bad = {w: (want, stem(w)) for w, want in GOLDEN.items() if stem(w) != want}
    assert not bad, f"stemmer mismatches: {bad}"


def test_deterministic_and_lowercase_domain():
    for w in ["looping", "loops", "looped", "loop"]:
        assert stem(w) == "loop"
    assert stem(stem("relational")) == stem("relational")  # stable fixpoint here
