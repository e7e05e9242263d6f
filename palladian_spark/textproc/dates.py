"""Full DateParser / DateAndTimeTagger port.

Round 1 shipped a compact date regex (taggers.tag_dates) covering the common
shapes the sentence masker needs; this module is the faithful counterpart of
the reference's universal date finder:

  * the 41 ``RegExp.ALL_DATE_FORMATS`` regexes, carried over verbatim from
    helper/constants/RegExp.java:74-290 (regex strings are contractual,
    like the StringTagger branches) in the exact trial order built at
    RegExp.java:347-359 (RFC → time → three-part → two-part → one-part),
    plus ``DATE_CONTEXT_YYYY`` which DateAndTimeTagger.DEFAULT appends
    (extraction/entity/DateAndTimeTagger.java:31-32);
  * ``find_dates`` = DateParser.findDates(text, formats)
    (helper/date/DateParser.java:197-254): double-whitespace collapse,
    period/digit-neighbor suppression, and the mask-as-you-go 'x' fill so
    a later (shorter) format never re-matches a span an earlier format
    claimed;
  * ``tag_datetimes`` = DateAndTimeTagger.getAnnotations
    (DateAndTimeTagger.java:43-59): every literal occurrence of each found
    date string in the ORIGINAL text becomes a DATETIME annotation.

Only the *recognition* half is ported — DateParserLogic's calendar-field
normalization feeds date arithmetic the KG pipeline doesn't consume; the
tagger contract is (value, offset, format) and that is what the
``dates_tagged`` oracle checks.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import regex

from palladian_spark.textproc.taggers import Annotation, DATETIME_TAG

# ---------------------------------------------------------------------------
# building blocks — RegExp.java:20-72, verbatim
# ---------------------------------------------------------------------------

LONG_YEAR = r"\d{4}"
SHORT_YEAR = r"\d{2}"
MONTH_NUMBER_DOUBLE = r"0[1-9]|1[0-2]"
MONTH_NUMBER_NORMAL = r"1[0-2]|0?[1-9]"
MONTH_NAME_SHORT_ENG = (
    r"[Jj]an|[Ff]eb|[Mm]ar|[Aa]pr|[Mm]ay|[Jj]un|[Jj]ul|[Aa]ug|[Ss]ep|[Ss]ept"
    r"|[Oo]ct|[Nn]ov|[Dd]ec|JAN|FEB|MAR|APR|MAY|JUN|JUL|AUG|SEP|SEPT|OCT|NOV|DEC")
MONTH_NAME_SHORT = (
    r"(?:[Aa]pr|[Aa]ug|[Dd]e[cz]|[Ff]eb|[Jj]an|[Jj]u[ln]|[Mm]a[iry]|[Mm]är"
    r"|[Nn]ov|[Oo][ck]t|[Ss]ept?|"
    r"APR|AUG|DE[CZ]|FEB|JAN|JU[LN]|MA[IRY]|MÄR|NOV|O[CK]T|SEPT?)\.?")
MONTH_NAME_LONG = (
    r"[Aa]pr(?:\.|il)?|[Aa]ug(?:\.|ust)?|[Dd]e[cz](?:\.|ember)?"
    r"|[Ff]eb(?:\.|ruary?)?|[Jj]an(?:\.|uary?)?|[Jj]ul[.iy]?|[Jj]un[.ei]?"
    r"|[Mm]a(?:[iy]\.?)?|[Mm]är[.z]?|[Mm]ar(?:\.|ch)?|[Nn]ov(?:\.|ember)?"
    r"|[Oo][ck]t(?:\.|ober)?|[Ss]ep(?:\.|t(?:ember)?)?|"
    r"APR(?:\.|IL)?|AUG(?:\.|UST)?|DE[CZ](?:\.|EMBER)?|FEB(?:\.|RUARY?)?"
    r"|JAN(?:\.|UARY?)?|JUL[.IY]?|JUN[.EI]?|MA(?:[IY]\.?)?|MÄR[.Z]?"
    r"|MAR(?:\.|CH)?|NOV(?:\.|EMBER)?|O[CK]T(?:\.|OBER)?|SEP(?:\.|T(?:EMBER)?)?")
MONTH_NAME_LONG2 = (
    r"[Aa]pr(?:il)?|[Aa]ug(?:ust)?|[Dd]e[cz](?:ember)?|[Ff]eb(?:ruary?)?"
    r"|[Jj]an(?:uary?)?|[Jj]ul[.iy]?|[Jj]un[.ei]?|[Mm]a[iy]?|[Mm]är[.z]?"
    r"|[Mm]ar(?:ch)?|[Nn]ov(?:ember)?|[Oo][ck]t(?:ober)?|[Ss]ep(?:t(?:ember)?)?|"
    r"APR(?:IL)?|AUG(?:UST)?|DE[CZ](?:EMBER)?|FEB(?:RUARY?)?|JAN(?:UARY?)?"
    r"|JUL[.IY]?|JUN[.EI]?|MA[IY]?|MÄR[.Z]?|MAR(?:CH)?|NOV(?:EMBER)?"
    r"|O[CK]T(?:OBER)?|SEP(?:T(?:EMBER)?)?")
DAY_OF_YEAR = r"[012][0-9][0-9]|3[0-5][0-9]|36[0-6]"
DAY_OF_MONTH = r"0[1-9]|[12][0-9]|3[01]"
DAY_OF_MONTH_1 = r"[1-9]|[12][0-9]|3[01]"
DAY_OF_MONTH_1_2 = DAY_OF_MONTH + "|" + DAY_OF_MONTH_1
DAY_OF_WEEK = r"[1-7]"
WEEK_OF_YEAR = r"W(?:0[1-9]|[1-4][0-9]|5[0-3])"
WEEKDAY_NAME_SHORT = r"Mon|Tue|Wed|Thu|Fri|Sat|Sun"
WEEKDAY_NAME_LONG = r"(?:Mon|Tues|Wednes|Thurs|Fri|Satur|Sun)day"

HOUR = r"1[0-9]|2[0-4]|0[0-9]"
HOUR12 = r"1[0-2]|0[0-9]"
HOUR_1 = r"1[0-9]|2[0-4]|[0-9]"
HOUR12_1 = r"1[0-2]|[0-9]"
MIN = r"0[0-9]|[1-5][0-9]"
SEC = MIN
TIMEZONE = r"\s(?:UTC|MEZ|GMT|Z|AEST|BST|EST|CET)"
TIME_SEC = f"(?:{HOUR}):(?:{MIN}):(?:{SEC})"
FLOAT_SEC_OPT = r"(?:\.\d*)?"
AM_PM = r"\s[AP]M"
TIME24 = f"(?:{HOUR})(?::(?:{MIN})(?::(?:{SEC}){FLOAT_SEC_OPT})?)?"
TIME24_1 = f"(?:{HOUR_1})(?::(?:{MIN})(?::(?:{SEC}){FLOAT_SEC_OPT})?)?"
# NOTE: the Java source appends AM_PM + "?" by plain string concatenation,
# so the '?' binds to the final 'M' only (…\s[AP]M?) — kept verbatim
TIME12 = f"(?:{HOUR12})(?::(?:{MIN})(?::(?:{SEC}){FLOAT_SEC_OPT})?)?{AM_PM}?"
TIME12_1 = (f"(?:{HOUR12_1})(?::(?:{MIN})(?::(?:{SEC}){FLOAT_SEC_OPT})?)?"
            f"{AM_PM}?")
TIME = TIME12 + "|" + TIME24 + "|" + TIME12_1 + "|" + TIME24_1
TIME_SEPARATOR = r"\s(?:/\s)?"
GMT_OPT = r"\s?(?:GMT|UTC|Z)?"
DIFF_UTC = f"{GMT_OPT}\\s?[+-](?:{HOUR})(?::?(?:{MIN}))?"
ISO_TIME = f"[T\\s]{TIME24}(?:{DIFF_UTC}|Z)?"

ST_ND_RD_TH_OPT = r"(?:st|nd|rd|th)?"
YEAR_SHORT_LONG = LONG_YEAR + "|(?:'?" + SHORT_YEAR + ")"
SEP_SYM = r"[/._-]"

# ---------------------------------------------------------------------------
# DateFormat definitions — (regex, format-name) pairs, RegExp.java:74-290
# ---------------------------------------------------------------------------

DATE_CONTEXT_YYYY = (
    r"(?<=(in )|(of )|(from )|(year )|(until )|(through )|(during )|(^))[0-9]{4}",
    "YYYY")
DATE_ISO8601_YMD_T = (
    f"(?:{YEAR_SHORT_LONG})-(?:{MONTH_NUMBER_DOUBLE})-(?:{DAY_OF_MONTH})"
    f"{ISO_TIME}", "YYYY-MM-DDTHH:MM:SS+HH:MM")
_ISO_YMD_SEP_T_1 = (f"(?:{YEAR_SHORT_LONG})/(?:{MONTH_NUMBER_DOUBLE})/"
                    f"(?:{DAY_OF_MONTH}){ISO_TIME}")
_ISO_YMD_SEP_T_2 = (f"(?:{YEAR_SHORT_LONG})\\.(?:{MONTH_NUMBER_DOUBLE})\\."
                    f"(?:{DAY_OF_MONTH}){ISO_TIME}")
_ISO_YMD_SEP_T_3 = (f"(?:{YEAR_SHORT_LONG})_(?:{MONTH_NUMBER_DOUBLE})_"
                    f"(?:{DAY_OF_MONTH}){ISO_TIME}")
DATE_ISO8601_YMD_SEPARATOR_T = (
    f"({_ISO_YMD_SEP_T_1}|{_ISO_YMD_SEP_T_2}|{_ISO_YMD_SEP_T_3})",
    "YYYY-MM-DDTHH:MM:SS+HH:MM")
DATE_ISO8601_YMD = (
    f"(?:{YEAR_SHORT_LONG})-(?:{MONTH_NUMBER_DOUBLE})-(?:{DAY_OF_MONTH})",
    "YYYY-MM-DD")
_ISO_YMD_SEP_1 = f"(?:{YEAR_SHORT_LONG})/(?:{MONTH_NUMBER_DOUBLE})/(?:{DAY_OF_MONTH})"
_ISO_YMD_SEP_2 = f"(?:{YEAR_SHORT_LONG})\\.(?:{MONTH_NUMBER_DOUBLE})\\.(?:{DAY_OF_MONTH})"
_ISO_YMD_SEP_3 = f"(?:{YEAR_SHORT_LONG})_(?:{MONTH_NUMBER_DOUBLE})_(?:{DAY_OF_MONTH})"
DATE_ISO8601_YMD_SEPARATOR = (
    f"{_ISO_YMD_SEP_1}|{_ISO_YMD_SEP_2}|{_ISO_YMD_SEP_3}", "YYYY-MM-DD")
DATE_ISO8601_YM = (
    f"(?:{YEAR_SHORT_LONG})-(?:{MONTH_NUMBER_DOUBLE})", "YYYY-MM")
DATE_ISO8601_YWD_T = (
    f"{LONG_YEAR}-(?:{WEEK_OF_YEAR})-{DAY_OF_WEEK}{ISO_TIME}",
    "YYYY-WW-DTHH:MM:SS+HH:MM")
DATE_ISO8601_YWD = (f"{LONG_YEAR}-(?:{WEEK_OF_YEAR})-{DAY_OF_WEEK}", "YYYY-WW-D")
DATE_ISO8601_YW = (f"{LONG_YEAR}-(?:{WEEK_OF_YEAR})", "YYYY-WW")
DATE_ISO8601_YD_T = (f"{LONG_YEAR}-(?:{DAY_OF_YEAR}){ISO_TIME}",
                     "YYYY-DDDTHH:MM:SS+HH:MM")
DATE_ISO8601_YD = (f"{LONG_YEAR}-(?:{DAY_OF_YEAR})", "YYYY-DDD")
DATE_ISO8601_YMD_NO = (f"{LONG_YEAR}(?:{MONTH_NUMBER_DOUBLE})(?:{DAY_OF_MONTH})",
                       "YYYYMMDD")
DATE_ISO8601_YWD_NO = (f"{LONG_YEAR}(?:{WEEK_OF_YEAR}){DAY_OF_WEEK}", "YYYYWWD")
DATE_ISO8601_YW_NO = (f"{LONG_YEAR}(?:{WEEK_OF_YEAR})", "YYYYWW")
DATE_ISO8601_YD_NO = (f"{LONG_YEAR}(?:{DAY_OF_YEAR})", "YYYYDDD")

_URL_D_1 = f"(?:{YEAR_SHORT_LONG})/(?:{MONTH_NUMBER_DOUBLE})/(?:{DAY_OF_MONTH})/"
_URL_D_2 = f"(?:{YEAR_SHORT_LONG})_(?:{MONTH_NUMBER_DOUBLE})_(?:{DAY_OF_MONTH})"
_URL_D_3 = f"(?:{YEAR_SHORT_LONG})\\.(?:{MONTH_NUMBER_DOUBLE})\\.(?:{DAY_OF_MONTH})"
_URL_D_4 = f"(?:{YEAR_SHORT_LONG})-(?:{MONTH_NUMBER_DOUBLE})-(?:{DAY_OF_MONTH})"
DATE_URL_D = (f"{_URL_D_1}|{_URL_D_2}|{_URL_D_3}|{_URL_D_4}", "YYYY_MM_DD")
DATE_URL_MMMM_D = (
    f"(?:{YEAR_SHORT_LONG})/(?:{MONTH_NAME_LONG})/(?:{DAY_OF_MONTH})/",
    "YYYY_MMMM_DD_URL")
DATE_URL = (f"(?:{YEAR_SHORT_LONG}){SEP_SYM}(?:{MONTH_NUMBER_DOUBLE})", "YYYY_MM")
DATE_URL_SPLIT = (
    f"{LONG_YEAR}/.+/(?:{MONTH_NUMBER_DOUBLE}){SEP_SYM}(?:{DAY_OF_MONTH})",
    "YYYY.x.MM.DD")

_EU_D_MM_Y_1 = f"(?:{DAY_OF_MONTH_1_2})\\.(?:{MONTH_NUMBER_NORMAL})\\.(?:{YEAR_SHORT_LONG})"
_EU_D_MM_Y_2 = f"(?:{DAY_OF_MONTH_1_2})/(?:{MONTH_NUMBER_NORMAL})/(?:{YEAR_SHORT_LONG})"
_EU_D_MM_Y_3 = f"(?:{DAY_OF_MONTH_1_2})_(?:{MONTH_NUMBER_NORMAL})_(?:{YEAR_SHORT_LONG})"
_EU_D_MM_Y_4 = f"(?:{DAY_OF_MONTH_1_2})-(?:{MONTH_NUMBER_NORMAL})-(?:{YEAR_SHORT_LONG})"
DATE_EU_D_MM_Y = (f"{_EU_D_MM_Y_1}|{_EU_D_MM_Y_2}|{_EU_D_MM_Y_3}|{_EU_D_MM_Y_4}",
                  "DD.MM.YYYY")
DATE_EU_D_MM_Y_T = (
    f"(?:{DATE_EU_D_MM_Y[0]}){TIME_SEPARATOR}(?:{TIME})({DIFF_UTC}|{TIMEZONE})?",
    "DD.MM.YYYY HH:MM:SS +UTC")
DATE_EU_MM_Y = (f"(?:{MONTH_NUMBER_NORMAL}){SEP_SYM}(?:{YEAR_SHORT_LONG})",
                "MM.YYYY")
DATE_EU_D_MM = (f"(?:{DAY_OF_MONTH_1_2})\\.(?:{MONTH_NUMBER_NORMAL})\\.", "DD.MM.")
DATE_EU_D_MMMM_Y = (
    f"(?:{DAY_OF_MONTH_1_2})(?:{ST_ND_RD_TH_OPT}\\s?|[.,]\\s?|-)"
    f"(?:{MONTH_NAME_LONG})(?:,?\\s|-)(?:{YEAR_SHORT_LONG})", "DD. MMMM YYYY")
DATE_EU_D_MMMM = (f"(?:{DAY_OF_MONTH_1_2})\\.? (?:{MONTH_NAME_LONG})", "DD.MMMM")
DATE_EU_D_MMMM_Y_T = (
    f"(?:{DAY_OF_MONTH_1_2})(?:\\.?\\s|-)(?:{MONTH_NAME_LONG})(?:,?\\s|-)"
    f"(?:{YEAR_SHORT_LONG}){TIME_SEPARATOR}(?:{TIME})({DIFF_UTC}|{TIMEZONE})?",
    "DD. MMMM YYYY HH:MM:SS +UTC")
DATE_MMMM_DD_HH_MM_SS_TZ_YYYY = (
    f"(?:{MONTH_NAME_SHORT})\\s(?:{DAY_OF_MONTH_1_2})\\s(?:{TIME}){TIMEZONE}"
    f"\\s{LONG_YEAR}", "MMMM DD HH:MM:SS TZ YYYY")

DATE_USA_MM_D_Y = (
    f"(?:{MONTH_NUMBER_NORMAL})/(?:{DAY_OF_MONTH_1_2})/(?:{YEAR_SHORT_LONG})",
    "MM/DD/YYYY")
DATE_USA_MM_D_Y_T = (
    f"(?:{MONTH_NUMBER_NORMAL})/(?:{DAY_OF_MONTH_1_2})/(?:{YEAR_SHORT_LONG})"
    f"{TIME_SEPARATOR}(?:{TIME})({DIFF_UTC}|{TIMEZONE})?",
    "MM/DD/YYYY HH:MM:SS +UTC")
_USA_SEP_1 = f"(?:{MONTH_NUMBER_NORMAL})\\.(?:{DAY_OF_MONTH_1_2})\\.(?:{YEAR_SHORT_LONG})"
_USA_SEP_2 = f"(?:{MONTH_NUMBER_NORMAL})-(?:{DAY_OF_MONTH_1_2})-(?:{YEAR_SHORT_LONG})"
_USA_SEP_3 = f"(?:{MONTH_NUMBER_NORMAL})_(?:{DAY_OF_MONTH_1_2})_(?:{YEAR_SHORT_LONG})"
DATE_USA_MM_D_Y_SEPARATOR = (f"{_USA_SEP_1}|{_USA_SEP_2}|{_USA_SEP_3}",
                             "MM/DD/YYYY")
DATE_USA_MM_D_Y_T_SEPARATOR = (
    f"(?:{_USA_SEP_1}|{_USA_SEP_2}|{_USA_SEP_3}){TIME_SEPARATOR}(?:{TIME})"
    f"(?:{DIFF_UTC}|{TIMEZONE})?", "MM/DD/YYYY HH:MM:SS +UTC")
DATE_USA_MM_Y = (f"(?:{MONTH_NUMBER_NORMAL})/(?:{YEAR_SHORT_LONG})", "MM/YYYY")
DATE_USA_MM_D = (f"(?:{MONTH_NUMBER_NORMAL})/(?:{DAY_OF_MONTH_1_2})", "MM/DD")
DATE_USA_MMMM_D_Y = (
    f"(?:{MONTH_NAME_LONG2})(?:\\s|\\.|\\.\\s)(?:{DAY_OF_MONTH_1_2})"
    f"(?:{ST_ND_RD_TH_OPT},?\\s|\\,|\\.\\s?|\\s)(?:{YEAR_SHORT_LONG})",
    "MMMM DD, YYYY")
DATE_USA_MMMM_D_Y_SEP = (
    f"(?:{MONTH_NAME_LONG})-(?:{DAY_OF_MONTH_1_2})-(?:{YEAR_SHORT_LONG})",
    "MMMM-DD-YYYY")
DATE_USA_MMMM_D_Y_T = (
    f"(?:{MONTH_NAME_LONG}) (?:{DAY_OF_MONTH_1_2}){ST_ND_RD_TH_OPT}, "
    f"(?:{YEAR_SHORT_LONG}),?{TIME_SEPARATOR}(?:{TIME})"
    f"(?:{DIFF_UTC}|{TIMEZONE})?", "MMMM DD, YYYY YYYY HH:MM:SS +UTC")
DATE_USA_MMMM_D = (
    f"(?:{MONTH_NAME_LONG}) (?:{DAY_OF_MONTH_1_2}){ST_ND_RD_TH_OPT}", "MMMM DD")

DATE_EUSA_MMMM_Y = (f"(?:{MONTH_NAME_LONG}) (?:{YEAR_SHORT_LONG})", "MMMM YYYY")
DATE_EUSA_YYYY_MMM_D = (
    f"{LONG_YEAR}-(?:{MONTH_NAME_LONG})-(?:{DAY_OF_MONTH_1_2})", "YYYY-MMM-D")

DATE_RFC_1123 = (
    f"(?:{WEEKDAY_NAME_SHORT}), (?:{DAY_OF_MONTH}) (?:{MONTH_NAME_SHORT_ENG}) "
    f"{LONG_YEAR} {TIME_SEC}{TIMEZONE}", "WD, DD MMM YYYY HH:MM:SS TZ")
DATE_RFC_1036 = (
    f"(?:{WEEKDAY_NAME_LONG}), (?:{DAY_OF_MONTH})-(?:{MONTH_NAME_SHORT_ENG})-"
    f"{SHORT_YEAR} {TIME_SEC}{TIMEZONE}", "WWD, DD-MMM-YY HH:MM:SS TZ")
DATE_RFC_1123_UTC = (
    f"(?:{WEEKDAY_NAME_SHORT}), (?:{DAY_OF_MONTH}) (?:{MONTH_NAME_SHORT_ENG}) "
    f"{LONG_YEAR} {TIME_SEC} {DIFF_UTC}", "WD, DD MMM YYYY HH:MM:SS +UTC")
DATE_RFC_1036_UTC = (
    f"(?:{WEEKDAY_NAME_LONG}), (?:{DAY_OF_MONTH})-(?:{MONTH_NAME_SHORT_ENG})-"
    f"{SHORT_YEAR} {TIME_SEC} {DIFF_UTC}", "WWD, DD-MMM-YY HH:MM:SS +UTC")
DATE_ANSI_C = (
    f"(?:{WEEKDAY_NAME_SHORT}) (?:{MONTH_NAME_SHORT_ENG}) (?:{DAY_OF_MONTH_1}) "
    f"{TIME_SEC} {LONG_YEAR}", "WD MMM DD_1 HH:MM:SS YYYY")
DATE_ANSI_C_TZ = (
    f"(?:{WEEKDAY_NAME_SHORT}) (?:{MONTH_NAME_SHORT_ENG}) (?:{DAY_OF_MONTH_1}) "
    f"{TIME_SEC} {LONG_YEAR} {DIFF_UTC}", "WD MMM DD_1 HH:MM:SS YYYY +UTC")

# trial ORDER is contractual (RegExp.java:347-359 static initializer):
# RFC → time → three-part → two-part → one-part; a longer format must claim
# its span before a shorter one sees the text.
RFC_FORMATS = [DATE_ANSI_C_TZ, DATE_ANSI_C, DATE_RFC_1036_UTC, DATE_RFC_1036,
               DATE_RFC_1123_UTC, DATE_RFC_1123]
TIME_FORMATS = [DATE_ISO8601_YD_T, DATE_ISO8601_YMD_T, DATE_ISO8601_YWD_T,
                DATE_USA_MM_D_Y_T, DATE_EU_D_MM_Y_T, DATE_USA_MMMM_D_Y_T,
                DATE_EU_D_MMMM_Y_T, DATE_USA_MM_D_Y_T_SEPARATOR,
                DATE_MMMM_DD_HH_MM_SS_TZ_YYYY]
THREE_PART_FORMATS = [DATE_ISO8601_YMD, DATE_USA_MM_D_Y, DATE_EU_D_MM_Y,
                      DATE_USA_MMMM_D_Y, DATE_USA_MMMM_D_Y_SEP,
                      DATE_EU_D_MMMM_Y, DATE_ISO8601_YWD, DATE_URL_D,
                      DATE_USA_MM_D_Y_SEPARATOR, DATE_EUSA_YYYY_MMM_D,
                      DATE_ISO8601_YMD_SEPARATOR]
TWO_PART_FORMATS = [DATE_ISO8601_YD, DATE_ISO8601_YM, DATE_ISO8601_YW,
                    DATE_EUSA_MMMM_Y, DATE_USA_MM_D, DATE_USA_MM_Y,
                    DATE_USA_MMMM_D, DATE_EU_D_MM, DATE_EU_D_MMMM,
                    DATE_EU_MM_Y, DATE_URL]
ONE_PART_FORMATS = [DATE_ISO8601_YD_NO, DATE_ISO8601_YMD_NO,
                    DATE_ISO8601_YW_NO, DATE_ISO8601_YWD_NO]

ALL_DATE_FORMATS: List[Tuple[str, str]] = (
    RFC_FORMATS + TIME_FORMATS + THREE_PART_FORMATS + TWO_PART_FORMATS
    + ONE_PART_FORMATS)

# DateAndTimeTagger.DEFAULT = ALL_DATE_FORMATS + DATE_CONTEXT_YYYY
DEFAULT_TAGGER_FORMATS: List[Tuple[str, str]] = (
    ALL_DATE_FORMATS + [DATE_CONTEXT_YYYY])

_COMPILED = {rx: regex.compile(rx) for rx, _ in DEFAULT_TAGGER_FORMATS}
_DOUBLE_SPACE = regex.compile(r"[ ]{2,}")

# ---------------------------------------------------------------------------
# sound per-format prefilter gates: each entry lists CONJUNCTIVE necessary
# conditions for the format to match AT ALL in a text — a condition is a
# string of characters (at least one must occur) or the _D7 sentinel
# (7+ consecutive digits).  A text failing a gate cannot contain a match
# for that format (every alternation branch requires the chars), so the
# expensive full scan is skipped; ~80% of the 42 scans are gated on
# typical conversational text.  Soundness is pinned by a randomized
# gated-vs-ungated equivalence test (tests/test_dates.py) and by the
# dates_tagged / dates_normalized oracles.
# ---------------------------------------------------------------------------
# regex-backed conditions (sentinel keys start with NUL so they can't
# collide with plain character classes):
#   d7     — 7+ consecutive digits (the number-only ISO formats)
#   d4     — a 4-digit run (context-year format)
#   month  — case-folded 2-letter month-name prefixes: every branch of
#            every month alternation (short/long/German) starts with one
#   d-sep  — a digit immediately followed by the given separator class:
#            in all gated numeric formats at least one separator follows
#            a day/month/year digit, so prose punctuation (a sentence
#            period after a word) no longer defeats the gate
_GATE_REGEXES = {
    "\x00d7": regex.compile(r"\d{7}"),
    "\x00d4": regex.compile(r"\d{4}"),
    "\x00month": regex.compile(
        r"(?i)(?:ja|fe|ma|mä|ap|au|ju|se|oc|ok|no|de)"),
    # loose digit-dash: for formats whose dash may precede a LETTER
    # (YYYY-W.., YYYY-MMM-D)
    "\x00d-": regex.compile(r"\d-"),
    # sharp digit-sep-(digit|'): every branch's FIRST separator sits
    # between a day/month/year digit and the next numeric field (a
    # 2-digit year may open with an apostrophe) — prose like "N7. " or
    # "7.5 km/h x" no longer passes for the full class
    "\x00d-d": regex.compile(r"\d-['\d]"),
    "\x00d/d": regex.compile(r"\d/['\d]"),
    "\x00d.d": regex.compile(r"\d\.['\d]"),
    "\x00dsep4d": regex.compile(r"\d[./_-]['\d]"),
    "\x00dsep3ad": regex.compile(r"\d[._-]['\d]"),
    "\x00dsep3bd": regex.compile(r"\d[/._]['\d]"),
}

_FORMAT_GATES = {
    DATE_ANSI_C_TZ[0]: (":",),
    DATE_ANSI_C[0]: (":",),
    DATE_RFC_1036_UTC[0]: (":",),
    DATE_RFC_1036[0]: (":",),
    DATE_RFC_1123_UTC[0]: (":",),
    DATE_RFC_1123[0]: (":",),
    DATE_ISO8601_YD_T[0]: ("\x00d-d",),
    DATE_ISO8601_YMD_T[0]: ("\x00d-d",),
    DATE_ISO8601_YWD_T[0]: ("\x00d-", "W"),
    DATE_USA_MM_D_Y_T[0]: ("\x00d/d",),
    DATE_EU_D_MM_Y_T[0]: ("\x00dsep4d",),
    DATE_USA_MMMM_D_Y_T[0]: (",", "\x00month"),
    DATE_EU_D_MMMM_Y_T[0]: ("\x00month",),
    DATE_MMMM_DD_HH_MM_SS_TZ_YYYY[0]: ("\x00month",),
    DATE_USA_MM_D_Y_T_SEPARATOR[0]: ("\x00dsep3ad",),
    DATE_ISO8601_YMD[0]: ("\x00d-d",),
    DATE_USA_MM_D_Y[0]: ("\x00d/d",),
    DATE_EU_D_MM_Y[0]: ("\x00dsep4d",),
    DATE_USA_MMMM_D_Y[0]: ("\x00month",),
    DATE_USA_MMMM_D_Y_SEP[0]: ("-", "\x00month"),
    DATE_EU_D_MMMM_Y[0]: ("\x00month",),
    DATE_ISO8601_YWD[0]: ("\x00d-", "W"),
    DATE_URL_D[0]: ("\x00dsep4d",),
    DATE_USA_MM_D_Y_SEPARATOR[0]: ("\x00dsep3ad",),
    DATE_EUSA_YYYY_MMM_D[0]: ("\x00d-", "\x00month"),
    DATE_ISO8601_YMD_SEPARATOR[0]: ("\x00dsep3bd",),
    DATE_ISO8601_YD[0]: ("\x00d-d",),
    DATE_ISO8601_YM[0]: ("\x00d-d",),
    DATE_ISO8601_YW[0]: ("\x00d-", "W"),
    DATE_EUSA_MMMM_Y[0]: ("\x00month",),
    DATE_USA_MM_D[0]: ("\x00d/d",),
    DATE_USA_MM_Y[0]: ("\x00d/d",),
    DATE_EU_D_MM[0]: ("\x00d.d",),
    DATE_EU_D_MMMM[0]: ("\x00month",),
    DATE_USA_MMMM_D[0]: ("\x00month",),
    DATE_EU_MM_Y[0]: ("\x00dsep4d",),
    DATE_URL[0]: ("\x00dsep4d",),
    DATE_ISO8601_YD_NO[0]: ("\x00d7",),
    DATE_ISO8601_YMD_NO[0]: ("\x00d7",),
    DATE_ISO8601_YW_NO[0]: ("W",),
    DATE_ISO8601_YWD_NO[0]: ("W",),
    DATE_CONTEXT_YYYY[0]: ("\x00d4",),
}


def _gates_pass(conds, text: str, cache: dict) -> bool:
    for cond in conds:
        hit = cache.get(cond)
        if hit is None:
            rx = _GATE_REGEXES.get(cond)
            if rx is not None:
                hit = rx.search(text) is not None
            else:
                hit = any(c in text for c in cond)
            cache[cond] = hit
        if not hit:
            return False
    return True


class ExtractedDate(NamedTuple):
    date_string: str
    format: str


def _remove_double_whitespaces(text: str) -> str:
    """StringHelper.removeDoubleWhitespaces — runs of 2+ SPACES → one."""
    return _DOUBLE_SPACE.sub(" ", text)


def _find_dates_one_format(text: str, pattern) -> List[str]:
    """DateParser.findDates(text, format) (DateParser.java:221-254):
    every match, minus those starting after '.' or touching a digit."""
    out: List[str] = []
    for m in pattern.finditer(text):
        start, end = m.start(), m.end()
        # dates must not start right after a period
        if start > 0 and text[start - 1] == ".":
            continue
        digit_neighbor = start > 0 and text[start - 1].isdigit()
        # faithful to the reference: the trailing check OVERWRITES the
        # leading one unless the match ends with '/'
        if end < len(text) and text[end - 1] != "/":
            digit_neighbor = text[end].isdigit()
        if not digit_neighbor:
            out.append(m.group())
    return out


def find_dates(text: str,
               formats: Sequence[Tuple[str, str]] = ALL_DATE_FORMATS
               ) -> List[ExtractedDate]:
    """DateParser.findDates(text, formats) (DateParser.java:197-209):
    formats tried in order; each found date string is masked with 'x'
    before the next format runs (Java replaceFirst = the date string is
    itself treated as a regex)."""
    text = _remove_double_whitespaces(text)
    result: List[ExtractedDate] = []
    gate_cache: dict = {}
    for rx, fmt_name in formats:
        gates = _FORMAT_GATES.get(rx)
        if gates and not _gates_pass(gates, text, gate_cache):
            continue
        pattern = _COMPILED.get(rx) or regex.compile(rx)
        found = _find_dates_one_format(text, pattern)
        for date_string in found:
            try:  # Java String.replaceFirst: pattern-compile the needle
                text = regex.sub(date_string, "x" * len(date_string), text,
                                 count=1)
            except regex.error:
                text = text.replace(date_string, "x" * len(date_string), 1)
            result.append(ExtractedDate(date_string, fmt_name))
        if found:
            gate_cache.clear()  # masking mutated the text — re-evaluate
    return result


def _occurrence_indices(text: str, search: str) -> List[int]:
    """StringHelper.getOccurrenceIndices (StringHelper.java:165-178)."""
    if not search:
        return []
    out: List[int] = []
    pos = text.find(search)
    while pos > -1:
        out.append(pos)
        pos = text.find(search, pos + 1)
    return out


def tag_datetimes(text: str,
                  formats: Sequence[Tuple[str, str]] = None
                  ) -> List[Annotation]:
    """DateAndTimeTagger.getAnnotations (DateAndTimeTagger.java:43-59):
    find dates with DEFAULT formats (ALL + context-year), then annotate
    EVERY literal occurrence of each date string in the original text."""
    if formats is None:
        formats = DEFAULT_TAGGER_FORMATS
    annotations: List[Annotation] = []
    for date in find_dates(text, formats):
        for idx in _occurrence_indices(text, date.date_string):
            annotations.append(Annotation(idx, date.date_string, DATETIME_TAG))
    return annotations


def find_date_formats(text: str,
                      formats: Sequence[Tuple[str, str]] = None
                      ) -> List[Tuple[str, str, int]]:
    """(value, format, first-occurrence offset) triples — the shape the
    ``dates_tagged`` contract query emits."""
    if formats is None:
        formats = DEFAULT_TAGGER_FORMATS
    out: List[Tuple[str, str, int]] = []
    for date in find_dates(text, formats):
        for idx in _occurrence_indices(text, date.date_string):
            out.append((date.date_string, date.format, idx))
    return out
