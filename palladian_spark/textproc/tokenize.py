"""Tokenization & segmentation kernels.

Semantics follow the reference implementation:
  * word tokens     — extraction/token/Tokenizer.java:27 (TOKEN_SPLIT_REGEX),
                      WordTokenizer.java:17-36
  * char n-grams    — extraction/token/CharacterNGramTokenizer.java:34-78
  * word n-grams    — extraction/token/NGramWrapperIterator.java:35-71
  * edge n-grams    — Tokenizer.java:94-121
  * sentence split  — Tokenizer.java:30 (SENTENCE_SPLIT_REGEX_EN),
                      extraction/sentence/PalladianSentenceDetector.java:70-127
  * case signature  — helper/nlp/StringHelper.java:1827-1868

All offsets are character offsets into the original string (the invariant
everything downstream depends on — core/AbstractToken.java:16-18).
"""

from __future__ import annotations

from typing import Iterator, List, NamedTuple

import regex


class Token(NamedTuple):
    start: int
    value: str

    @property
    def end(self) -> int:
        return self.start + len(self.value)


# The word-token regex (Tokenizer.java:27), compiled DOTALL|IGNORECASE like
# WordTokenizer.java:19.  \p{L} handles accented letters ("Shéff", "Yaoundé").
TOKEN_SPLIT_REGEX = (
    r"(?:[A-Z][a-z]?\.)+"              # abbreviations A.B., U.S.
    r"|[\p{L}\w+]+(?:[-\.,][\p{L}\w]+)*"  # words incl. hyphen/dot compounds
    r"|\.[\p{L}\w]+"                   # .com style
    r"|</?[\p{L}\w]+>"                 # tags
    r"|\$\d+\.\d+"                     # $1.23
    r"|[^\w\s<]+"                      # punctuation runs
)
_TOKEN_PATTERN = regex.compile(TOKEN_SPLIT_REGEX, regex.DOTALL | regex.IGNORECASE)

# Sentence split (Tokenizer.java:30).  Variable-width lookbehind needs the
# `regex` module (stdlib `re` rejects it).
SENTENCE_SPLIT_REGEX_EN = (
    r"(?<!(\.|\()|([A-Z]\.[A-Z]){1,10}|St|Mr|mr|Vers|Dr|dr|Prof|Nr|Rev|Mrs|mrs"
    r"|Jr|jr|vs| eg|e\.g|ca|max|Min|etc| sq| ft)"
    r"((\.|\?|\!)(’|”|\")+(?=\s+[A-Z])|\.|\?+|\!+)"
    r"(?!(\.|[0-9]|\"|”|'|\)|[!?]|(com|de|fr|uk|au|ca|cn|org|net)/?\s|\()"
    r"|[A-Za-z]{1,15}\.|[A-Za-z]{1,15}\(\))"
)
_SENTENCE_PATTERN_EN = regex.compile(SENTENCE_SPLIT_REGEX_EN)

PADDING_CHARACTER = "#"


def word_tokens(text: str) -> List[Token]:
    """All word tokens with offsets (WordTokenizer.java:22-34)."""
    return [Token(m.start(), m.group()) for m in _TOKEN_PATTERN.finditer(text)]


def tokenize(text: str) -> List[str]:
    """Token values only (Tokenizer.java:44-47)."""
    return [m.group() for m in _TOKEN_PATTERN.finditer(text)]


def iter_char_ngrams(text: str, min_n: int, max_n: int,
                     padding: bool = False) -> Iterator[str]:
    """Char n-grams of length min_n..max_n, per-offset ascending lengths.

    With ``padding``, (max_n - 1) '#' chars are appended on both sides and
    all-padding grams are skipped (CharacterNGramTokenizer.java:34-78).
    The emission order (offset-major, length-minor) matters: the classifier
    caps distinct terms at maxTerms *in first-seen order*
    (PalladianTextClassifier.java:202-204).
    """
    if padding:
        pad = PADDING_CHARACTER * (max_n - 1)
        text = pad + text + pad
    n_chars = len(text)
    for offset in range(n_chars - min_n + 1):
        top = min(max_n, n_chars - offset)
        for length in range(min_n, top + 1):
            gram = text[offset:offset + length]
            if padding and not gram.replace(PADDING_CHARACTER, ""):
                continue  # skip all-padding grams
            yield gram


def char_ngrams(text: str, min_n: int, max_n: int, padding: bool = False) -> List[str]:
    return list(iter_char_ngrams(text, min_n, max_n, padding))


def iter_word_ngrams(text: str, min_n: int, max_n: int) -> Iterator[str]:
    """Space-joined word n-grams n1..n2 over the token stream
    (NGramWrapperIterator.java:35-71): per start position, ascending lengths.
    """
    values = tokenize(text)
    n_tok = len(values)
    for i in range(n_tok):
        top = min(max_n, n_tok - i)
        for length in range(min_n, top + 1):
            yield " ".join(values[i:i + length])


def iter_skip_grams(text: str, min_n: int, max_n: int) -> Iterator[str]:
    """Word n-grams interleaved with their skip-grams
    (SkipGramWrapperIterator.java:30-54): after every n-gram of MORE than
    two words, its 'first last' skip-gram is emitted; 1/2-word tokens pass
    through unchanged."""
    for gram in iter_word_ngrams(text, min_n, max_n):
        yield gram
        parts = gram.split()
        if len(parts) > 2:
            yield parts[0] + " " + parts[-1]


_TRIM_UNWANTED = set(
    ",.;:!|?¬  #-'\"*/\\@<>=·^_+»ￂ•”“´`¯~®™○")


def palladian_trim(s: str, keep: str = "") -> str:
    """StringHelper.trim(string, keepCharacters)
    (StringHelper.java:956-1023): java-trim + HTML unescape, then strip
    the unwanted punctuation set (minus ``keep``) and space characters
    from both ends until stable."""
    import html
    s = s.strip()
    if not s:
        return s
    s = html.unescape(s)
    unwanted = _TRIM_UNWANTED - set(keep)
    while s:
        first, last = s[0], s[-1]
        delete_first = first in unwanted or first.isspace()
        delete_last = last in unwanted or last.isspace()
        if not (delete_first or delete_last):
            break
        if delete_first:
            s = s[1:]
        if delete_last and s:
            s = s[:-1]
        s = s.strip()
    return s.strip()


def get_sentences(text: str, only_real_sentences: bool = False,
                  mask_spans: List[Token] | None = None) -> List[str]:
    """Sentence values, optionally keeping only 'real' sentences
    (Tokenizer.java:316-342): last line of each candidate must end in
    . ? ! .” .\" and the quote-preserving-trimmed form must be longer
    than 8 chars with more than 2 words."""
    values = [t.value for t in sentences(text, mask_spans)]
    if not only_real_sentences:
        return values
    real: List[str] = []
    for sentence in values:
        sentence = sentence.split("\n")[-1]
        if sentence.endswith((".", "?", "!", ".”", '."')):
            clean = palladian_trim(sentence, keep='“”"')
            word_count = clean.count(" ") + 1
            if len(clean) > 8 and word_count > 2:
                real.append(sentence.strip())
    return real


def char_edge_ngrams(part: str, n: int, must_hit_left_edge: bool = False) -> List[str]:
    """Edge-only (prefix/suffix) char n-grams (Tokenizer.java:94-121)."""
    grams = []
    if len(part) >= n:
        grams.append(part[:n])
        if not must_hit_left_edge and len(part) > n:
            grams.append(part[-n:])
    return grams


def sentences(text: str, mask_spans: List[Token] | None = None) -> List[Token]:
    """Sentence tokens with offsets (PalladianSentenceDetector.java:70-127).

    ``mask_spans`` (URLs/dates/smileys found upstream) are replaced with
    'M'-runs before splitting so their dots don't break sentences; offsets
    refer to — and values are re-sliced from — the ORIGINAL text.
    """
    masked = text
    if mask_spans:
        chars = list(text)
        for span in mask_spans:
            for i in range(span.start, min(span.end, len(chars))):
                chars[i] = "M"
        masked = "".join(chars)

    out: List[Token] = []

    def _emit(start: int, end: int) -> None:
        value = masked[start:end]
        lstripped = value.lstrip()
        left = len(value) - len(lstripped)
        trimmed = lstripped.rstrip()
        if trimmed:
            s = start + left
            out.append(Token(s, text[s:s + len(trimmed)]))

    # Fast path: every branch of the split pattern consumes a `.?!`
    # terminator, so a text whose only terminator (if any) is its final
    # character either matches exactly once at the very end or not at all —
    # both produce the single trimmed sentence.  This skips the expensive
    # variable-width-lookbehind scan for the dominant short-turn case.
    n = len(masked)
    if (masked.find(".", 0, n - 1) == -1 and masked.find("?", 0, n - 1) == -1
            and masked.find("!", 0, n - 1) == -1):
        _emit(0, n)
        return out

    last = 0
    for m in _SENTENCE_PATTERN_EN.finditer(masked):
        _emit(last, m.end())
        last = m.end()
    if last < len(masked):
        _emit(last, len(masked))
    return out


def get_case_signature(s: str) -> str:
    """Collapse each char to one of [Aa0 -], deduplicating runs
    (StringHelper.java:1827-1868)."""
    out: List[str] = []
    for ch in s:
        if ch.isupper():
            sig = "A"
        elif ch.islower():
            sig = "a"
        elif ch.isdigit():
            sig = "0"
        elif ch.isspace():
            sig = " "
        else:
            sig = "-"
        if not out or out[-1] != sig:
            out.append(sig)
    return "".join(out)


def get_sub_phrases(s: str) -> List[str]:
    """All consecutive-word sub-phrases (StringHelper.java:2062-2082):
    "quick brown fox" → [quick, quick brown, quick brown fox, brown, ...]."""
    # Java String.split("\\s") drops trailing empties but keeps interior ones.
    parts = regex.split(r"\s", s)
    while parts and parts[-1] == "":
        parts.pop()
    phrases: List[str] = []
    for i in range(len(parts)):
        for j in range(i, len(parts)):
            phrase = " ".join(parts[i:j + 1])
            if phrase:
                phrases.append(phrase)
    return phrases


def is_completely_uppercase(s: str) -> bool:
    return bool(s) and s == s.upper()


def starts_uppercase(s: str) -> bool:
    return bool(s) and s[0].isupper()
