"""Bundled tagged-corpus slice for the classifier POS tagger.

The reference trains PalladianPosTagger on Brown-corpus word/TAG files
(extraction/pos/PalladianPosTagger.java:110-135); that corpus cannot ship
here, so this is a small hand-written Brown-STYLE slice (word, TAG) built
from public English vocabulary — deterministic, dependency-free, and
sized so the char-1..7-gram dictionary stays tiny.  Tags follow the Penn
conventions the repo's rule tagger emits (DT IN TO CC VBZ VBD VBP VB VBN
VBG PRP RB NN NNS NNP JJ CD . ,).
"""

POS_CORPUS: list[tuple[str, str]] = [
    # determiners
    ("the", "DT"), ("The", "DT"), ("a", "DT"), ("an", "DT"),
    ("this", "DT"), ("that", "DT"), ("these", "DT"), ("those", "DT"),
    # prepositions
    ("of", "IN"), ("in", "IN"), ("for", "IN"), ("on", "IN"), ("at", "IN"),
    ("with", "IN"), ("by", "IN"), ("from", "IN"), ("over", "IN"),
    ("under", "IN"), ("into", "IN"), ("about", "IN"), ("after", "IN"),
    # to / conjunctions
    ("to", "TO"), ("and", "CC"), ("or", "CC"), ("but", "CC"),
    # pronouns
    ("he", "PRP"), ("she", "PRP"), ("it", "PRP"), ("they", "PRP"),
    ("we", "PRP"), ("you", "PRP"), ("I", "PRP"),
    # verbs — finite forms
    ("is", "VBZ"), ("has", "VBZ"), ("does", "VBZ"), ("works", "VBZ"),
    ("makes", "VBZ"), ("runs", "VBZ"), ("goes", "VBZ"), ("says", "VBZ"),
    ("sells", "VBZ"), ("ships", "VBZ"), ("buys", "VBZ"), ("owns", "VBZ"),
    ("was", "VBD"), ("were", "VBD"), ("had", "VBD"), ("did", "VBD"),
    ("made", "VBD"), ("said", "VBD"), ("went", "VBD"), ("visited", "VBD"),
    ("arrived", "VBD"), ("ordered", "VBD"), ("shipped", "VBD"),
    ("are", "VBP"), ("have", "VBP"), ("do", "VBP"), ("know", "VBP"),
    ("be", "VB"), ("go", "VB"), ("make", "VB"), ("take", "VB"),
    ("been", "VBN"), ("done", "VBN"), ("given", "VBN"), ("taken", "VBN"),
    ("being", "VBG"), ("working", "VBG"), ("running", "VBG"),
    ("making", "VBG"), ("shipping", "VBG"), ("going", "VBG"),
    # adverbs
    ("not", "RB"), ("very", "RB"), ("quickly", "RB"), ("slowly", "RB"),
    ("often", "RB"), ("never", "RB"), ("always", "RB"), ("early", "RB"),
    ("recently", "RB"), ("again", "RB"),
    # adjectives
    ("good", "JJ"), ("new", "JJ"), ("large", "JJ"), ("small", "JJ"),
    ("late", "JJ"), ("early", "JJ"), ("red", "JJ"), ("open", "JJ"),
    ("big", "JJ"), ("old", "JJ"), ("global", "JJ"), ("local", "JJ"),
    # common nouns
    ("time", "NN"), ("year", "NN"), ("work", "NN"), ("order", "NN"),
    ("part", "NN"), ("price", "NN"), ("market", "NN"), ("company", "NN"),
    ("country", "NN"), ("account", "NN"), ("supplier", "NN"),
    ("customer", "NN"), ("nation", "NN"), ("region", "NN"), ("city", "NN"),
    ("house", "NN"), ("man", "NN"), ("woman", "NN"), ("day", "NN"),
    ("week", "NN"), ("month", "NN"), ("name", "NN"), ("line", "NN"),
    ("orders", "NNS"), ("parts", "NNS"), ("prices", "NNS"),
    ("companies", "NNS"), ("customers", "NNS"), ("suppliers", "NNS"),
    ("years", "NNS"), ("days", "NNS"), ("items", "NNS"), ("nations", "NNS"),
    # proper nouns (capitalized)
    ("London", "NNP"), ("Berlin", "NNP"), ("Paris", "NNP"),
    ("Germany", "NNP"), ("France", "NNP"), ("China", "NNP"),
    ("John", "NNP"), ("Mary", "NNP"), ("Smith", "NNP"), ("Miller", "NNP"),
    ("Alice", "NNP"), ("Robert", "NNP"), ("Europe", "NNP"),
    ("Monday", "NNP"), ("March", "NNP"), ("Customer", "NNP"),
    ("Supplier", "NNP"), ("Nation", "NNP"), ("Region", "NNP"),
    ("C1", "NNP"), ("S2", "NNP"), ("N3", "NNP"), ("A10", "NNP"),
    ("B25", "NNP"), ("X99", "NNP"), ("K450", "NNP"), ("Z1078", "NNP"),
    # numbers
    ("1", "CD"), ("2", "CD"), ("7", "CD"), ("10", "CD"), ("42", "CD"),
    ("100", "CD"), ("1995", "CD"), ("2024", "CD"), ("3.14", "CD"),
    ("1,000", "CD"), ("one", "CD"), ("two", "CD"), ("three", "CD"),
    ("ten", "CD"),
    # punctuation
    (".", "."), ("!", "."), ("?", "."), (",", ","), (";", ","),
]

# Token-frequency weights: a real corpus slice carries frequency (Brown
# has 'the' tens of thousands of times), and the classifier's TEXT half
# needs that mass so a closed-class word's own char-grams outweigh the
# same grams inside longer words.  Weights approximate Zipf bands.
_SHORT_FUNC = {
    "the", "The", "a", "an", "of", "in", "for", "on", "at", "with", "by",
    "from", "to", "and", "or", "but", "he", "she", "it", "they", "we",
    "you", "I", "is", "was", "were", "are", "have", "has", "be", "been",
    "not", ".", ",", ";", "!", "?",
}
_CAP_TWINS = {"Customer", "Supplier", "Nation", "Region"}


def corpus_weight(word: str, tag: str) -> int:
    if word in _SHORT_FUNC:
        return 30
    if word in _CAP_TWINS:
        return 8
    if tag == "NNP":
        return 4
    if tag in ("NN", "NNS"):
        return 3
    return 2


POS_CORPUS_WEIGHTED: list[tuple[str, str, int]] = [
    (w, t, corpus_weight(w, t)) for w, t in POS_CORPUS
]
