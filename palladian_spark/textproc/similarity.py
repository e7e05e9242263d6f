"""String similarity metrics for entity linking / canonicalization.

Semantics follow the reference toolkit (palladian-commons helper/nlp/*):
  * levenshtein_similarity   — LevenshteinSimilarity.java:24-37
  * jaro_winkler_similarity  — JaroWinklerSimilarity.java:23-102
                               (NOTE: trims + UPPERCASES first, and uses an
                               asymmetric match window [i-range, i+range) —
                               this differs from off-the-shelf libraries)
  * char n-gram set sims     — CharacterNGramSimilarity.java:50-85
  * token set sims           — TokenSimilarity.java:32-48
  * set similarities         — helper/math/SetSimilarities.java:54-122

Pure Python, batch-applied inside pandas UDFs by the Spark linking stage.
"""

from __future__ import annotations

import re
from typing import Callable, Set


# ---------------------------------------------------------------------------
# set similarities (both-empty → 1, one-empty → 0)
# ---------------------------------------------------------------------------

def dice(a: Set[str], b: Set[str]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return 2.0 * len(a & b) / (len(a) + len(b))


def jaccard(a: Set[str], b: Set[str]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def overlap(a: Set[str], b: Set[str]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / min(len(a), len(b))


SET_SIMILARITIES: dict[str, Callable[[Set[str], Set[str]], float]] = {
    "dice": dice,
    "jaccard": jaccard,
    "overlap": overlap,
}


# ---------------------------------------------------------------------------
# edit-distance metrics
# ---------------------------------------------------------------------------

def levenshtein_distance(s1: str, s2: str) -> int:
    """Classic DP edit distance (insert/delete/substitute, unit costs)."""
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    previous = list(range(len(s1) + 1))
    for j, c2 in enumerate(s2, start=1):
        current = [j]
        for i, c1 in enumerate(s1, start=1):
            cost = 0 if c1 == c2 else 1
            current.append(min(previous[i] + 1, current[i - 1] + 1,
                               previous[i - 1] + cost))
        previous = current
    return previous[-1]


def levenshtein_similarity(s1: str, s2: str) -> float:
    """1 − dist/max(len); equal or both-empty → 1 (LevenshteinSimilarity.java:24-37)."""
    if s1 == s2:
        return 1.0
    max_len = max(len(s1), len(s2))
    if max_len == 0:
        return 1.0
    return 1.0 - levenshtein_distance(s1, s2) / max_len


def jaro_winkler_similarity(s1: str, s2: str) -> float:
    """Jaro-Winkler with the reference's exact quirks
    (JaroWinklerSimilarity.java:23-102): trim+uppercase both strings, swap so
    s1 is the shorter, match range = len2 // 2 with an exclusive upper bound,
    prefix bonus l*0.1*(1-jaro) with l ≤ 4.
    """
    s1 = s1.strip().upper()
    s2 = s2.strip().upper()
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if l1 > l2:
        s1, s2 = s2, s1
        l1, l2 = l2, l1

    s1_flag = [False] * l2
    s2_flag = [False] * l2
    m = 0
    rng = l2 // 2
    for i in range(l1):
        for j in range(max(0, i - rng), min(l2, i + rng)):
            if not s2_flag[j] and s1[i] == s2[j]:
                s2_flag[j] = True
                s1_flag[i] = True
                m += 1
                break
    if m == 0:
        return 0.0

    t = 0
    k = 0
    for i in range(l1):
        if s1_flag[i]:
            j = k
            while j < l2:
                if s2_flag[j]:
                    k = j + 1
                    break
                j += 1
            if s1[i] != s2[j]:
                t += 1
    t //= 2

    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    prefix = 0
    while prefix < min(4, l1) and s1[prefix] == s2[prefix]:
        prefix += 1
    return jaro + prefix * 0.1 * (1.0 - jaro)


# ---------------------------------------------------------------------------
# n-gram / token set metrics
# ---------------------------------------------------------------------------

def _padded_ngrams(s: str, n: int) -> Set[str]:
    """'#'-padded char n-grams: "word" (n=3) → {##w, #wo, wor, ord, rd#, d##}
    (CharacterNGramSimilarity.java:64-82; all-padding grams are NOT skipped
    here, unlike the classifier tokenizer)."""
    pad = "#" * (n - 1)
    s = pad + s + pad
    return {s[i:i + n] for i in range(len(s) - n + 1)}


def char_ngram_similarity(s1: str, s2: str, n: int = 3, kind: str = "dice") -> float:
    """Lowercase both; equal → 1; else set similarity of padded n-grams."""
    s1l, s2l = s1.lower(), s2.lower()
    if s1l == s2l:
        return 1.0
    return SET_SIMILARITIES[kind](_padded_ngrams(s1l, n), _padded_ngrams(s2l, n))


def token_similarity(s1: str, s2: str, kind: str = "jaccard") -> float:
    """Lowercase/trim; whitespace-token set similarity (TokenSimilarity.java:32-48)."""
    s1l, s2l = s1.lower().strip(), s2.lower().strip()
    if s1l == s2l:
        return 1.0
    t1 = set(re.split(r"\s", s1l))
    t2 = set(re.split(r"\s", s2l))
    return SET_SIMILARITIES[kind](t1, t2)


METRICS: dict[str, Callable[[str, str], float]] = {
    "levenshtein": levenshtein_similarity,
    "jaro_winkler": jaro_winkler_similarity,
    "ngram3_dice": lambda a, b: char_ngram_similarity(a, b, 3, "dice"),
    "ngram3_jaccard": lambda a, b: char_ngram_similarity(a, b, 3, "jaccard"),
    "ngram3_overlap": lambda a, b: char_ngram_similarity(a, b, 3, "overlap"),
    "token_jaccard": lambda a, b: token_similarity(a, b, "jaccard"),
}
