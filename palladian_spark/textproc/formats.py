"""Tagging-format conversions (SURVEY.md §2.1).

Mirrors FileFormatParser (extraction/entity/FileFormatParser.java) and the
NerHelper.tag renderer (extraction/entity/tagger/NerHelper.java:152-220):

  * column ⇄ XML conversion of token/tag training data
  * tag stripping, tag-set extraction
  * combined (multi-token) annotations from column / inline-XML text
  * rendering annotations back into tagged text, with the reference's
    embedded invariant: annotation.value MUST equal the text slice.

These are per-document string kernels: at corpus scale each runs inside an
Arrow batch (one document per row); none of them shuffle.
"""

from __future__ import annotations

import re
from typing import List, Set, Tuple

from palladian_spark.textproc.taggers import Annotation

_TAG_RE = re.compile(r"</?([A-Za-z0-9_]+)>")


def column_to_xml(column_text: str, sep: str = "\t") -> str:
    """CoNLL-style column (token SEP tag per line) → inline-XML tagged text
    (FileFormatParser.java:39-110): consecutive same-tag tokens share one
    tag pair; tag 'O' means untagged; blank lines are kept as breaks."""
    out: List[str] = []
    open_tag: str | None = None
    for line in column_text.splitlines():
        if not line.strip():
            if open_tag:
                out.append(f"</{open_tag}>")
                open_tag = None
            out.append("\n")
            continue
        token, _, tag = line.partition(sep)
        # case-insensitive merge like the reference's equalsIgnoreCase —
        # 'per' and 'PER' runs must share one tag pair, not close/reopen
        tag = (tag.strip() or "O").upper()
        if tag != (open_tag or "O"):
            if open_tag:
                out.append(f"</{open_tag}>")
                open_tag = None
            if tag != "O":
                out.append(f"<{tag}>")
                open_tag = tag
        out.append(token)
    if open_tag:
        out.append(f"</{open_tag}>")
    # join with single spaces; tags hug their tokens; line breaks kept
    text = ""
    for piece in out:
        if piece == "\n":
            text = text.rstrip() + "\n"
        elif piece.startswith("</"):
            text = text.rstrip() + piece + " "
        elif piece.startswith("<"):
            text += piece
        else:
            text += piece + " "
    return text.rstrip()


def xml_to_column(xml_text: str, sep: str = "\t") -> str:
    """Inverse conversion (FileFormatParser.java:117-154): one
    token SEP tag line per whitespace token."""
    lines: List[str] = []
    open_tag: str | None = None
    for tok in xml_text.split():
        opens = re.findall(r"<([A-Za-z0-9_]+)>", tok)
        closes = re.findall(r"</([A-Za-z0-9_]+)>", tok)
        word = _TAG_RE.sub("", tok)
        if not word:
            continue
        tag = opens[0] if opens else (open_tag or "O")
        lines.append(f"{word}{sep}{tag}")
        if opens and not closes:
            open_tag = opens[0]
        if closes:
            open_tag = None
    return "\n".join(lines)


def get_text(tagged: str) -> str:
    """Strip inline tags → raw text (FileFormatParser.java:198-208 /
    regexp_replace(text, '</?[^>]+>', ''))."""
    return _TAG_RE.sub("", tagged)


def get_tags_from_column(column_text: str, sep: str = "\t") -> Set[str]:
    """Distinct tag set (FileFormatParser.java:169-190)."""
    tags: Set[str] = set()
    for line in column_text.splitlines():
        if line.strip():
            _, _, tag = line.partition(sep)
            if tag.strip():
                tags.add(tag.strip())
    return tags


def annotations_from_column(column_text: str, sep: str = "\t"
                            ) -> Tuple[str, List[Annotation]]:
    """Combined (multi-token) annotations + the reconstructed raw text
    (FileFormatParser.getAnnotationsFromColumn semantics: consecutive
    same-tag non-O tokens merge into one annotation; text joins tokens
    with single spaces)."""
    tokens: List[Tuple[str, str]] = []
    for line in column_text.splitlines():
        if line.strip():
            token, _, tag = line.partition(sep)
            tokens.append((token, (tag.strip() or "O")))
    text_parts: List[str] = []
    annotations: List[Annotation] = []
    pos = 0
    run_start, run_tag, run_parts = -1, "O", []

    def flush():
        nonlocal run_start, run_tag, run_parts
        if run_tag != "O" and run_parts:
            annotations.append(Annotation(run_start, " ".join(run_parts), run_tag))
        run_start, run_tag, run_parts = -1, "O", []

    for token, tag in tokens:
        if tag != run_tag:
            flush()
            run_tag = tag
            run_start = pos
        run_parts.append(token)
        text_parts.append(token)
        pos += len(token) + 1
    flush()
    return " ".join(text_parts), annotations


def annotations_from_xml(xml_text: str) -> Tuple[str, List[Annotation]]:
    """Inline-XML tagged text → (raw text, annotations) with offsets into
    the raw text (FileFormatParser.getAnnotationsFromXmlText)."""
    raw: List[str] = []
    annotations: List[Annotation] = []
    pos = 0
    open_tag: str | None = None
    open_start = -1
    idx = 0
    for m in _TAG_RE.finditer(xml_text):
        chunk = xml_text[idx:m.start()]
        raw.append(chunk)
        pos += len(chunk)
        idx = m.end()
        if m.group(0).startswith("</"):
            if open_tag:
                value = "".join(raw)[open_start:pos]
                annotations.append(Annotation(open_start, value, open_tag))
                open_tag = None
        else:
            open_tag = m.group(1)
            open_start = pos
    raw.append(xml_text[idx:])
    return "".join(raw), annotations


def tag_text(text: str, annotations: List[Annotation],
             fmt: str = "XML") -> str:
    """Render annotations into tagged text (NerHelper.tag,
    NerHelper.java:152-220): sorted by offset, nested spans dropped, and
    the reference's embedded assertion that each annotation's value equals
    the text slice — our per-turn text-equality invariant."""
    from palladian_spark.textproc.taggers import remove_nested, sort_annotations
    kept = remove_nested(sort_annotations(list(annotations)))
    out: List[str] = []
    last = 0
    for ann in kept:
        slice_ = text[ann.start:ann.start + len(ann.value)]
        if slice_ != ann.value:
            raise AssertionError(
                f"annotation value {ann.value!r} != text slice {slice_!r} "
                f"at {ann.start} (NerHelper.java:173-182 invariant)")
        out.append(text[last:ann.start])
        if fmt == "XML":
            out.append(f"<{ann.tag.upper()}>{ann.value}</{ann.tag.upper()}>")
        elif fmt == "BRACKETS":
            out.append(f"[{ann.tag.upper()} {ann.value} ]")
        elif fmt == "SLASHES":
            out.append(" ".join(f"{t}/{ann.tag.upper()}"
                                for t in ann.value.split(" ")))
        else:
            raise ValueError(f"unknown format {fmt}")
        last = ann.start + len(ann.value)
    out.append(text[last:])
    return "".join(out)
