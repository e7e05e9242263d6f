"""DateParserLogic port — calendar-field normalization of recognized dates.

Round 2 shipped the *recognition* half of the reference's date stack (the
41 ``ALL_DATE_FORMATS`` regexes + trial order in textproc/dates.py); this
module is the *normalization* half: ``DateParserLogic``
(palladian-commons/src/main/java/ws/palladian/helper/date/
DateParserLogic.java:66-283 dispatch, :425-719 helpers), which turns a
``(date_string, format)`` pair into typed (year, month, day, hour, minute,
second, timezone) fields — what a KG consumer actually wants from a
DATETIME mention.

Faithfulness notes:

  * Dispatch is keyed by the *format name* where the reference dispatches
    on DateFormat object identity.  Names are shared between base formats
    and their ``_SEPARATOR`` variants (e.g. ``YYYY-MM-DD``), whose parse
    logic is identical (``getSeparatorRegEx`` handles every separator), so
    name-keying is lossless — and it additionally covers the five formats
    the reference's if-chain forgot (ISO8601_YMD_SEPARATOR[_T],
    ISO8601_YD_T, USA_MM_D_Y[_T]_SEPARATOR raise IllegalStateException in
    the reference; here they parse like their named siblings).
  * Two-digit years resolve against a context year
    (DateParserLogic.get4DigitYear:573-582 uses the wall clock; we take a
    ``context_year`` parameter so results are deterministic and
    oracle-checkable, defaulting to the current year like the reference).
  * Java's lenient GregorianCalendar arithmetic (day/hour overflow rolls
    forward; week 53 in a 52-week year rolls into January) is reproduced
    with ``timedelta`` arithmetic from a month-1 anchor.
  * Java ``Calendar.DAY_OF_WEEK`` is 1=Sunday..7=Saturday while the ISO
    date strings carry 1=Monday..7=Sunday; the reference feeds the ISO
    digit straight into the Calendar field (setDateByWeekOfYear:344-371),
    landing one weekday EARLIER than ISO (and digit 1 on the week's
    Sunday).  Reproduced bit-for-bit — fidelity beats correctness here.
  * Any unparseable field makes ``parse_date`` return None (the reference
    would propagate a NumberFormatException out of findDates; a
    distributed pipeline must not die on one weird mention).
"""

from __future__ import annotations

import datetime as _dt
from typing import List, NamedTuple, Optional

import regex

from palladian_spark.textproc.dates import TIMEZONE

_TIMEZONE_RX = regex.compile(TIMEZONE, regex.IGNORECASE)


class DateParts(NamedTuple):
    """Typed calendar fields; None = not present in the date string."""
    year: Optional[int]
    month: Optional[int]
    day: Optional[int]
    hour: Optional[int]
    minute: Optional[int]
    second: Optional[int]
    timezone: Optional[str]


# DateHelper.monthNameToNumber (DateHelper.java:117-151): English + German
_MONTHS = {}
for _num, _names in enumerate([
        ("january", "januar", "jan"), ("february", "februar", "feb"),
        ("march", "märz", "mär", "mar"), ("april", "apr"),
        ("may", "mai"), ("june", "juni", "jun"), ("july", "juli", "jul"),
        ("august", "aug"), ("september", "sep", "sept"),
        ("october", "oktober", "oct", "okt"), ("november", "nov"),
        ("december", "dezember", "dec", "dez")], start=1):
    for _n in _names:
        _MONTHS[_n] = _num


def _month_name_to_number(month: str) -> int:
    cleaned = (month.replace(",", "").replace(".", "").replace(" ", "")
               .lower())
    return _MONTHS.get(cleaned, -1)


def _jsplit(s: str, pattern: str) -> List[str]:
    """Java String.split: trailing empty strings are dropped."""
    parts = regex.split(pattern, s)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def _separator_regex(s: str) -> Optional[str]:
    """getSeparatorRegEx (DateParserLogic.java:687-701) — checked in the
    reference's order: '.' wins over '/', '_', '-'."""
    for lit, rx in ((".", r"\."), ("/", "/"), ("_", "_"), ("-", "-")):
        if lit in s:
            return rx
    return None


def _remove_no_digits(s: str) -> str:
    """removeNoDigits (DateParserLogic.java:602-637): strip 'YY
    apostrophes, trailing ',…' / '.…', st/nd/rd/th suffixes and anything
    after a newline."""
    result = s
    idx = result.find("'")
    if idx != -1:
        result = result[idx + 1:]
    idx = result.find(",")
    if idx != -1:
        result = result[:idx]
    idx = result.find(".")
    if idx != -1:
        result = result[:idx]
    for suffix in ("th", "st", "nd", "rd"):
        idx = result.find(suffix)
        if idx != -1:
            result = result[:idx]
            break
    return regex.sub(r"\n.*", "", result)


def _get_4digit_year(year: int, context_year: int) -> int:
    """get4DigitYear (DateParserLogic.java:573-582): century folding
    around the context year ('99 → 1999, '07 → 2007 when context=2010)."""
    if year > 100:
        return year
    if year > context_year - 2000:
        return year + 1900
    return year + 2000


def _normalize_year(s: str, context_year: int) -> int:
    return _get_4digit_year(int(_remove_no_digits(s)), context_year)


def _split_time_zone(s: str):
    """splitTimeZone (DateParserLogic.java:666-677)."""
    m = _TIMEZONE_RX.search(s)
    if m is None:
        return None
    tz = m.group().strip()
    time_part = _TIMEZONE_RX.sub(" ", s).replace("  ", " ")
    return time_part, tz


class _Logic:
    """Mutable field carrier mirroring DateParserLogic's int fields
    (-1 = unset) so the per-format branches transliterate 1:1."""

    def __init__(self, context_year: int):
        self.context_year = context_year
        self.year = self.month = self.day = -1
        self.hour = self.minute = self.second = -1
        self.timezone: Optional[str] = None

    # -- setters (DateParserLogic.java:425-571) -------------------------

    def set_date_values(self, parts: List[str], year_pos: int,
                        month_pos: int, day_pos: int) -> None:
        if year_pos != -1:
            self.year = _normalize_year(parts[year_pos], self.context_year)
        if month_pos != -1:
            month_string = parts[month_pos].replace(" ", "")
            if regex.fullmatch(r"\d+", month_string):
                self.month = int(month_string)
            else:
                self.month = _month_name_to_number(month_string)
        if day_pos != -1:
            self.day = int(_remove_no_digits(parts[day_pos]))

    def set_date_by_week_of_year(self, date_string: str, with_day: bool,
                                 with_separator: bool) -> None:
        if with_separator:
            parts = _jsplit(date_string, "-")
        else:
            parts = [date_string[0:4], date_string[4:7],
                     date_string[7:8] if with_day else ""]
        week = int(parts[1][1:])
        # Java DAY_OF_WEEK: 1=Sunday..7=Saturday; unset day → MONDAY (2).
        # The ISO digit D therefore lands on iso-weekday D-1 (D≥2) or the
        # week's Sunday (D=1) — reproduced verbatim (see module notes).
        java_dow = int(parts[2]) if with_day else 2
        iso_dow = 7 if java_dow == 1 else java_dow - 1
        base = _dt.date.fromisocalendar(int(parts[0]), 1, 1)
        d = base + _dt.timedelta(weeks=week - 1, days=iso_dow - 1)
        self.year, self.month = d.year, d.month
        if with_day:
            self.day = d.day

    def set_date_by_day_of_year(self, date_string: str,
                                with_separator: bool) -> None:
        if with_separator:
            parts = _jsplit(date_string, "-")
            y, doy = parts[0], parts[1]
        else:
            y, doy = date_string[0:4], date_string[4:]
        d = _dt.date(int(y), 1, 1) + _dt.timedelta(days=int(doy) - 1)
        self.year, self.month, self.day = d.year, d.month, d.day

    def set_time_values(self, time_string: str) -> None:
        actual = time_string
        if "." in actual:
            actual = regex.sub(r"\.(\d)*", "", actual)
        separator = None
        if "Z" in time_string:
            separator = "Z"
        elif "+" in time_string:
            separator = r"\+"
        elif "-" in time_string:
            separator = "-"
        cleaned, diff = actual, None
        if separator is not None:
            split = _jsplit(actual, separator)
            cleaned = split[0] if split else ""
            if separator != "Z" and len(split) > 1:
                diff = split[1]
        self._set_actual_time_values(cleaned)
        if diff is not None:
            self._set_time_diff(diff, separator)

    def _set_actual_time_values(self, time_string: str) -> None:
        if time_string == "" or ":" in time_string:
            parts = time_string.strip().split(":")
            if parts and parts[0] != "":
                self.hour = int(parts[0])
                if len(parts) > 1:
                    self.minute = int(parts[1])
                    if len(parts) > 2:
                        self.second = int(parts[2])
        else:
            self.hour = int(time_string)

    def _set_time_diff(self, time: str, sign: str) -> None:
        if -1 in (self.year, self.month, self.day, self.hour):
            return
        temp_minute = 0
        if ":" in time:
            hh, mm = time.split(":")[:2]
            temp_hour, temp_minute = int(hh), int(mm)
        elif len(time) == 4:
            temp_hour, temp_minute = int(time[0:2]), int(time[2:4])
        else:
            temp_hour = int(time)
        minute2 = self.minute if self.minute != -1 else 0
        # lenient Gregorian arithmetic: anchor at day 1 so Feb 30-style
        # inputs roll forward like Java instead of raising
        base = (_dt.datetime(self.year, self.month, 1, 0, minute2)
                + _dt.timedelta(days=self.day - 1, hours=self.hour))
        delta = _dt.timedelta(hours=temp_hour, minutes=temp_minute)
        d = base + delta if sign == "-" else base - delta
        self.year, self.month, self.day = d.year, d.month, d.day
        self.hour = d.hour
        if self.minute != -1 or temp_minute != 0:
            self.minute = d.minute

    def _set_24h(self, meridiem: Optional[str]) -> None:
        if self.hour == -1 or meridiem is None:
            return
        if meridiem.lower() == "pm" and 0 < self.hour < 12:
            self.hour += 12
        elif meridiem.lower() == "am" and self.hour == 12:
            self.hour = 0


def _has_am_pm(s: str) -> Optional[str]:
    for m in ("am", "AM", "pm", "PM"):
        if m in s:
            return m
    return None


def _remove_am_pm(s: str, meridiem: str) -> str:
    return s.replace(meridiem, "").replace("  ", " ")


def _parse_ymd_t(lg: _Logic, ds: str) -> None:
    separator = "T" if "T" in ds else " "
    temp = _jsplit(ds, separator)
    lg.set_date_values(_jsplit(temp[0], _separator_regex(temp[0])), 0, 1, 2)
    lg.set_time_values(temp[1])


def _parse_url_split(lg: _Logic, ds: str) -> None:
    parts = _jsplit(ds, "/")
    lg.year = _normalize_year(parts[0], lg.context_year)
    try:
        lg.day = int(parts[-1])
    except ValueError:
        last = parts[-1]
        sub = _jsplit(last, _separator_regex(last))
        lg.month, lg.day = int(sub[0]), int(sub[1])
    else:
        lg.month = int(parts[-2])


def _parse_usa_mmmm_d_y(lg: _Logic, ds: str) -> None:
    ds = regex.sub(r",\s|,|\s", " ", ds)
    parts = _jsplit(ds, r"\s")
    if len(parts) == 2:
        head = parts[0].split(".")
        parts = [head[0], head[1], parts[1]]
    lg.set_date_values(parts, 2, 0, 1)


def _parse_time_with_date(lg: _Logic, ds: str, date_from_parts,
                          time_from: int) -> None:
    """Shared skeleton of the *_T branches: strip AM/PM, extract date
    fields, then join the non-'/' tail tokens into the time string."""
    meridiem = _has_am_pm(ds)
    if meridiem is not None:
        ds = _remove_am_pm(ds, meridiem)
    parts = _jsplit(ds, r"\s")
    date_from_parts(parts)
    lg.set_time_values("".join(p for p in parts[time_from:]
                               if "/" not in p))
    lg._set_24h(meridiem)


def _build_dispatch():
    d = {}

    def handler(*names):
        def deco(fn):
            for n in names:
                d[n] = fn
            return fn
        return deco

    @handler("YYYY-MM-DDTHH:MM:SS+HH:MM")
    def _(lg, ds):
        _parse_ymd_t(lg, ds)

    @handler("YYYY-MM-DD", "YYYY_MM_DD")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, _separator_regex(ds)), 0, 1, 2)

    @handler("YYYY-MM")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, "-"), 0, 1, -1)

    @handler("YYYY-WW-D")
    def _(lg, ds):
        lg.set_date_by_week_of_year(ds, True, True)

    @handler("YYYY-WW-DTHH:MM:SS+HH:MM")
    def _(lg, ds):
        sep = "T" if "T" in ds else " "
        parts = _jsplit(ds, sep)
        lg.set_date_by_week_of_year(parts[0], True, True)
        lg.set_time_values(parts[1])

    @handler("YYYY-WW")
    def _(lg, ds):
        lg.set_date_by_week_of_year(ds, False, True)

    @handler("YYYY-DDD")
    def _(lg, ds):
        lg.set_date_by_day_of_year(ds, True)

    @handler("YYYY-DDDTHH:MM:SS+HH:MM")
    def _(lg, ds):
        # absent from the reference's if-chain (would throw); parsed like
        # its YWD_T sibling with day-of-year resolution
        sep = "T" if "T" in ds else " "
        parts = _jsplit(ds, sep)
        lg.set_date_by_day_of_year(parts[0], True)
        lg.set_time_values(parts[1])

    @handler("YYYY_MMMM_DD_URL")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, "/"), 0, 1, 2)

    @handler("YYYY.x.MM.DD")
    def _(lg, ds):
        _parse_url_split(lg, ds)

    @handler("YYYY_MM")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, _separator_regex(ds)), 0, 1, -1)

    @handler("DD.MM.YYYY")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, _separator_regex(ds)), 2, 1, 0)

    @handler("MM/DD/YYYY")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, _separator_regex(ds)), 2, 0, 1)

    @handler("DD. MMMM YYYY")
    def _(lg, ds):
        ds = regex.sub(r"\.\s?", " ", ds)
        ds = ds.replace("-", " ")
        lg.set_date_values(_jsplit(ds, r"\s"), 2, 1, 0)

    @handler("MMMM DD, YYYY")
    def _(lg, ds):
        _parse_usa_mmmm_d_y(lg, ds)

    @handler("MMMM-DD-YYYY")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, "-"), 2, 0, 1)

    @handler("MMMM YYYY")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, r"\s"), 1, 0, -1)

    @handler("YYYY-MMM-D")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, "-"), 0, 1, 2)

    @handler("MM.YYYY")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, _separator_regex(ds)), 1, 0, -1)

    @handler("DD.MM.")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, _separator_regex(ds)), -1, 1, 0)

    @handler("DD.MMMM")
    def _(lg, ds):
        ds = ds.replace(".", "")
        lg.set_date_values(_jsplit(ds, r"\s"), -1, 1, 0)

    @handler("MM/DD")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, "/"), -1, 0, 1)

    @handler("MMMM DD")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, r"\s"), -1, 0, 1)

    @handler("MM/YYYY")
    def _(lg, ds):
        lg.set_date_values(_jsplit(ds, "/"), 1, 0, -1)

    @handler("WD MMM DD_1 HH:MM:SS YYYY")
    def _(lg, ds):
        parts = _jsplit(ds, r"\s")
        lg.set_date_values(parts, 4, 1, 2)
        lg.set_time_values(parts[3])

    @handler("WD MMM DD_1 HH:MM:SS YYYY +UTC")
    def _(lg, ds):
        parts = _jsplit(ds, r"\s")
        lg.set_date_values(parts, 4, 1, 2)
        lg.set_time_values(parts[3] + parts[5])

    @handler("WD, DD MMM YYYY HH:MM:SS TZ")
    def _(lg, ds):
        parts = _jsplit(ds, r"\s")
        lg.set_date_values(parts, 3, 2, 1)
        lg.set_time_values(parts[4])

    @handler("WD, DD MMM YYYY HH:MM:SS +UTC")
    def _(lg, ds):
        parts = _jsplit(ds, r"\s")
        lg.set_date_values(parts, 3, 2, 1)
        lg.set_time_values(parts[4] + parts[5])

    @handler("WWD, DD-MMM-YY HH:MM:SS TZ")
    def _(lg, ds):
        parts = _jsplit(ds, r"\s")
        lg.set_date_values(_jsplit(parts[1], "-"), 2, 1, 0)
        lg.set_time_values(parts[2])

    @handler("WWD, DD-MMM-YY HH:MM:SS +UTC")
    def _(lg, ds):
        parts = _jsplit(ds, r"\s")
        lg.set_date_values(_jsplit(parts[1], "-"), 2, 1, 0)
        lg.set_time_values(parts[2] + parts[3])

    @handler("YYYYMMDD")
    def _(lg, ds):
        lg.year = int(ds[0:4])
        lg.month = int(ds[4:6])
        lg.day = int(ds[6:8])

    @handler("YYYYWWD")
    def _(lg, ds):
        lg.set_date_by_week_of_year(ds, True, False)

    @handler("YYYYWW")
    def _(lg, ds):
        lg.set_date_by_week_of_year(ds, False, False)

    @handler("YYYYDDD")
    def _(lg, ds):
        lg.set_date_by_day_of_year(ds, False)

    @handler("DD.MM.YYYY HH:MM:SS +UTC")
    def _(lg, ds):
        def date(parts):
            head = _jsplit(parts[0], _separator_regex(parts[0]))
            lg.set_date_values(head, 2, 1, 0)
        _parse_time_with_date(lg, ds, date, 1)

    @handler("MM/DD/YYYY HH:MM:SS +UTC")
    def _(lg, ds):
        def date(parts):
            head = _jsplit(parts[0], _separator_regex(parts[0]))
            lg.set_date_values(head, 2, 0, 1)
        _parse_time_with_date(lg, ds, date, 1)

    @handler("DD. MMMM YYYY HH:MM:SS +UTC")
    def _(lg, ds):
        meridiem = _has_am_pm(ds)
        if meridiem is not None:
            ds = _remove_am_pm(ds, meridiem)
        if "-" in ds:
            ds = ds.replace("-", " ")
        parts = _jsplit(ds, r"\s")
        lg.set_date_values(parts, 2, 1, 0)
        lg.set_time_values("".join(p for p in parts[3:] if "/" not in p))
        lg._set_24h(meridiem)

    @handler("MMMM DD, YYYY YYYY HH:MM:SS +UTC")
    def _(lg, ds):
        def date(parts):
            lg.set_date_values(parts, 2, 0, 1)
        _parse_time_with_date(lg, ds, date, 3)

    @handler("MMMM DD HH:MM:SS TZ YYYY")
    def _(lg, ds):
        parts = _jsplit(ds, r"\s")
        lg.set_date_values(parts, 3, 0, 1)
        lg.set_time_values(parts[2])

    @handler("YYYY")
    def _(lg, ds):
        lg.year = int(ds)

    return d


_DISPATCH = _build_dispatch()


def parse_date(date_string: str, fmt: str,
               context_year: Optional[int] = None) -> Optional[DateParts]:
    """DateParserLogic.parse() (DateParserLogic.java:66-283): typed
    calendar fields for a recognized (date_string, format-name) pair, or
    None when the string defeats the format's field logic."""
    handler = _DISPATCH.get(fmt)
    if handler is None:
        return None
    if context_year is None:
        context_year = _dt.date.today().year
    lg = _Logic(context_year)
    ds = date_string
    tz_split = _split_time_zone(ds)
    if tz_split is not None:
        ds, lg.timezone = tz_split
    try:
        handler(lg, ds)
    except (ValueError, IndexError, TypeError, OverflowError):
        return None

    def opt(v):
        return None if v == -1 else v

    return DateParts(opt(lg.year), opt(lg.month), opt(lg.day),
                     opt(lg.hour), opt(lg.minute), opt(lg.second),
                     lg.timezone)
