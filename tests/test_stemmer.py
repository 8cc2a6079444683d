"""Porter2 stemmer parity against NLTK's SnowballStemmer (the oracle)."""

import pytest

from mfar_tpu.sparse.stemmer import porter2_stem

nltk = pytest.importorskip("nltk")
from nltk.stem.snowball import SnowballStemmer  # noqa: E402

ORACLE = SnowballStemmer("english")

KNOWN_PAIRS = {
    "running": "run",
    "fairly": "fair",
    "easily": "easili",
    "generation": "generat",
    "national": "nation",
    "skies": "sky",
    "dying": "die",
    "agreed": "agre",
    "conflated": "conflat",
    "troubling": "troubl",
    "hopping": "hop",
    "happy": "happi",
    "relational": "relat",
    "generously": "generous",
    "communication": "communic",
    "news": "news",
    "proceed": "proceed",
    "exceed": "exceed",
    "ties": "tie",
    "cries": "cri",
    "gas": "gas",
    "this": "this",
    "gaps": "gap",
    "congeneric": "congener",
}


def test_known_pairs():
    for word, expected in KNOWN_PAIRS.items():
        assert porter2_stem(word) == expected, word


def test_wide_vocabulary_parity():
    # A broad mix of morphology: -tion/-ness/-ly/-ing/-ed/-ize/-ful/-ity...
    words = """
    abatement abilities absorption accessorize accompanying accomplishment
    actively adjustable administrative adorably aggressiveness agreeable
    alphabetical amazingly analytical angrily announcement apologies
    applicability appreciation architecturally argumentative artfully
    assemblies association atomization attractiveness authorities
    automatically baking batteries beautiful beautifully becoming
    biological bitterness blessedly bodies boxes breathing brightness
    capabilities carefully categorization ceaselessly charges chemically
    cities civilization classical cleanliness collapsible colonial
    comfortably commercialization communities computing conditional
    connectivity consciousness conservation consistently continuously
    conversational copies corrosion counting creatively cries critically
    crying curiosities databases dazzling decisively dedication
    defensibly deliveries demonstrative dependencies depositional
    designing dictionaries dietary dimensional directories disability
    dismissive distinctively dramatically dried dutifully dynamically
    eagerness earnestly ecological economically edges editorial
    effectiveness efficiencies electrical elegantly emotionally
    emphasizing enabled endlessly energies engineering enjoyable
    entities environmental equalizer equations essentially establishment
    evaluation eventually exactly examination excellently exceptional
    exercises expandable expectations experiences explanatory explosive
    expressive extremely facilities factories faithfully families
    fashionable feeding festively fictional fisheries fitting flawlessly
    flies fluidly forgetful formalities formally foundational freshness
    friendliness functionality galleries generalization generative
    gently geological gloriously goodness gracefully grantedly
    graphically gratefulness greatly happily hardness harmonization
    hastily heavily helpfully hesitation historically hopefully
    hopelessness horizontally hugely humanities hydration hypothetically
    identifiable illustrative imaginative immediately implicitly
    impossibly impressively inclusion industrialization infinitely
    informational injuries innovative inspirational installation
    instantly institutional intentional interactive internally
    interpretation invitations ironically irresistibly journeys joyfully
    judgmental justification kindness knitting knowingly laboratories
    largely lately latencies leadership legalization libraries lightly
    likelihood literally lively locally logically loneliness loveliness
    luckily luminosity machinery magically magnetization maintainability
    managerial markedly marvelous massively materialization mathematically
    measurement mechanically memories mentally methodically minimally
    mobility modernization momentarily monitoring moralities motivational
    mysteriously nationally naturally necessities neighborly nervously
    normalization notably noticeably novelties objectively observational
    occasionally operational opportunities optimization organically
    originality outstandingly oxidation painfully particularly
    passionately peacefully perfectly personalities physically
    playfulness plentifully policies politically popularity positively
    possibilities practically precisely predictably preferences
    presentational previously primarily probabilities proceedings
    productivity professionally properties protective publicly
    qualities quantities quickly quietly radically rationality readily
    realistically reasonably recognizable recommendation recoveries
    recursively regularity relatively reliability remarkably removable
    repeatedly representative resourcefulness respectively responsibly
    restoration retries revolutionary rigidity romantically roughness
    routinely sadly safely satisfyingly scalability scientifically
    seasonally secretly securely selectively sensibly separately
    seriously shamelessly sharply shipping silently similarities
    simplicity simultaneously sincerely singularity skillfully sleepily
    smoothly socially softly solidarity specialization specifically
    spectacularly spirituality spontaneously stability statistically
    steadily stories strangely strategically strengthening structurally
    studies stylistically subjectively substantially successfully
    sufficiently suitability summaries supportive surprisingly
    sustainability sweetness sympathies systematically technicalities
    technologically temporarily tenderness territories thankfully
    theoretically thoughtfully tirelessly tolerance traditionally
    transformation transitional translations transparency tremendously
    truthfully typically ultimately unconditionally understandably
    unexpectedly universities unnecessarily urgently usability usefully
    utilities variations verification vertically vibrantly victories
    vigorously visibility visually vitality vividly vocabularies
    voluntarily warmly wearily willingness wonderfully workabilities
    """.split()
    mismatches = [
        (w, porter2_stem(w), ORACLE.stem(w))
        for w in words
        if porter2_stem(w) != ORACLE.stem(w)
    ]
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches[:20]}"


def test_short_and_edge_words():
    for w in ["a", "to", "be", "ox", "is", "it"]:
        assert porter2_stem(w) == w
    assert porter2_stem("") == ""
    assert porter2_stem("THE") == "the"
    assert porter2_stem("Cats") == ORACLE.stem("cats")
