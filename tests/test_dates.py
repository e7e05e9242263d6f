"""Goldens for the full DateParser / DateAndTimeTagger port.

Expectations derive from the reference's own tests — recognition level
(date string + format + offsets); the calendar-normalization half of
DateParserLogic is out of scope (the KG tagger contract is spans, not
normalized timestamps):
  * DateAndTimeTaggerTest.java:14-21 (span golden)
  * DateParserTest.java:363-421 (format recognition cases)
"""

import pytest

from palladian_spark.textproc.dates import (
    ALL_DATE_FORMATS, find_dates, tag_datetimes)


def test_tagger_golden_mayan_calendar():
    # DateAndTimeTaggerTest.java:16-20
    anns = tag_datetimes("The mayan calendar ends on 21.12.2012, nobody "
                         "knows what happens after end of 12/2012.")
    assert len(anns) == 2
    assert anns[0].start == 27
    assert len(anns[0].value) == 10
    assert anns[0].value == "21.12.2012"
    assert anns[1].value == "12/2012"


@pytest.mark.parametrize("text,expected_value,expected_format", [
    # DateParserTest.java recognition cases (normalized values in the
    # reference; we assert the matched string + winning format)
    ("August 2010", "August 2010", "MMMM YYYY"),
    ("SEPTEMBER 1, 2010", "SEPTEMBER 1, 2010", "MMMM DD, YYYY"),
    (", 17/09/06 03:51:53", "17/09/06 03:51:53", "DD.MM.YYYY HH:MM:SS +UTC"),
    ("30.09.2010", "30.09.2010", "DD.MM.YYYY"),
    ("Sept. 3, 2010", "Sept. 3, 2010", "MMMM DD, YYYY"),
    ("JUNE 1, 2010", "JUNE 1, 2010", "MMMM DD, YYYY"),
    ("Feb. 2010", "Feb. 2010", "MMMM YYYY"),
    ("2007-12-06T17:37:45Z", "2007-12-06T17:37:45Z",
     "YYYY-MM-DDTHH:MM:SS+HH:MM"),
])
def test_find_dates_reference_cases(text, expected_value, expected_format):
    dates = find_dates(text)
    assert dates, f"no date found in {text!r}"
    assert dates[0].date_string == expected_value
    assert dates[0].format == expected_format


def test_find_dates_two_iso_timestamps():
    # DateParserTest.java:406-409
    dates = find_dates("2007-12-06T17:37:45Z 2008-12-06T17:37:45Z")
    assert [d.date_string for d in dates] == [
        "2007-12-06T17:37:45Z", "2008-12-06T17:37:45Z"]


def test_find_dates_weekday_long_date():
    # DateParserTest.java:411-413 — exactly ONE date (the weekday is part
    # of no matching RFC format here, and masking stops re-matches)
    dates = find_dates("Saturday, September 20, 2008")
    assert len(dates) == 1


def test_find_dates_rfc_gmt_offset():
    # DateParserTest.java:415-417
    dates = find_dates("Mon, 18 Apr 2011 09:16:00 GMT-0700")
    assert len(dates) == 1
    assert dates[0].date_string == "Mon, 18 Apr 2011 09:16:00 GMT-0700"


def test_digit_neighbor_suppression_trailing():
    # DateParser.java:240-244: a trailing digit suppresses the match
    dates = find_dates("2010-07-201")
    assert all(d.date_string != "2010-07-20" for d in dates)


def test_digit_neighbor_leading_overwritten_by_trailing_check():
    # faithful reference quirk (DateParser.java:237-244): the trailing
    # check OVERWRITES the leading-digit flag, so a date preceded by a
    # digit but followed by a non-digit is still kept
    dates = find_dates("id 92010-07-20 junk")
    assert any(d.date_string == "2010-07-20" for d in dates)


def test_period_prefix_suppression():
    # dates must not start right after a period (DateParser.java:233-235)
    dates = find_dates("v1.12.2012 release")
    assert all(d.date_string != "12.2012" for d in dates)


def test_context_year_only_in_default_tagger():
    # DATE_CONTEXT_YYYY is the tagger's extra, not part of ALL_DATE_FORMATS
    assert find_dates("built in 2009 and used", ALL_DATE_FORMATS) == []
    anns = tag_datetimes("built in 2009 and used")
    assert [a.value for a in anns] == ["2009"]
    assert anns[0].start == 9


def test_all_occurrences_annotated():
    # DateAndTimeTagger.java:52-56: every literal occurrence of the date
    # string becomes an annotation — and a string extracted twice is
    # annotated at every occurrence PER extraction (faithful duplication)
    anns = tag_datetimes("from 2010-07-20 until 2010-07-20 again")
    assert [a.start for a in anns] == [5, 22, 5, 22]


def test_format_count_is_contractual():
    assert len(ALL_DATE_FORMATS) == 41  # 6 RFC + 9 time + 11 + 11 + 4


# ---------------------------------------------------------------------------
# DateParserLogic normalization (round 3 — textproc/date_logic.py)
# ---------------------------------------------------------------------------

def test_normalize_two_digit_years():
    # get4DigitYear (DateParserLogic.java:573-582): century folds around
    # the context year — above the context's YY → 1900s, at/below → 2000s
    from palladian_spark.textproc.date_logic import parse_date
    assert parse_date("11/23/99", "MM/DD/YYYY", 2026)[:3] == (1999, 11, 23)
    assert parse_date("11/23/'99", "MM/DD/YYYY", 2026)[:3] == (1999, 11, 23)
    assert parse_date("5/12/07", "MM/DD/YYYY", 2026)[:3] == (2007, 5, 12)
    assert parse_date("5/12/26", "MM/DD/YYYY", 2026)[:3] == (2026, 5, 12)
    assert parse_date("5/12/27", "MM/DD/YYYY", 2026)[:3] == (1927, 5, 12)
    # context-dependence: same string, different wall-clock year
    assert parse_date("1.2.15", "DD.MM.YYYY", 2010)[:3] == (1915, 2, 1)
    assert parse_date("1.2.15", "DD.MM.YYYY", 2020)[:3] == (2015, 2, 1)


def test_normalize_month_names():
    # DateHelper.monthNameToNumber (DateHelper.java:117-151): English and
    # German names, short and long, case-cleaned
    from palladian_spark.textproc.date_logic import parse_date
    assert parse_date("November 23, 2014", "MMMM DD, YYYY", 2026)[:3] \
        == (2014, 11, 23)
    assert parse_date("23. Dezember 2014", "DD. MMMM YYYY", 2026)[:3] \
        == (2014, 12, 23)
    assert parse_date("June 2014", "MMMM YYYY", 2026)[:3] == (2014, 6, None)
    assert parse_date("2014-Sep-02", "YYYY-MMM-D", 2026)[:3] == (2014, 9, 2)
    assert parse_date("Aug-14-2013", "MMMM-DD-YYYY", 2026)[:3] \
        == (2013, 8, 14)
    assert parse_date("3rd June", "DD.MMMM", 2026)[:3] == (None, 6, 3)


def test_normalize_times_and_zones():
    from palladian_spark.textproc.date_logic import parse_date
    # RFC-1123 with timezone split (splitTimeZone:666-677)
    p = parse_date("Tue, 02 Sep 2014 10:27:00 GMT",
                   "WD, DD MMM YYYY HH:MM:SS TZ", 2026)
    assert p == (2014, 9, 2, 10, 27, 0, "GMT")
    # ISO with UTC diff: '+02:00' means local, normalized BACKWARD
    # (setTimeDiff:464-504 subtracts for '+')
    p = parse_date("2014-09-02T10:27:00+02:00",
                   "YYYY-MM-DDTHH:MM:SS+HH:MM", 2026)
    assert (p.hour, p.minute, p.day) == (8, 27, 2)
    # diff rolling over midnight moves the date (lenient calendar)
    p = parse_date("2014-09-02T01:00:00+02:00",
                   "YYYY-MM-DDTHH:MM:SS+HH:MM", 2026)
    assert (p.day, p.hour) == (1, 23)
    # PM → 24h (set24h:330-341)
    p = parse_date("12/23/2014 10:27 PM", "MM/DD/YYYY HH:MM:SS +UTC", 2026)
    assert (p.hour, p.minute) == (22, 27)
    p = parse_date("12/23/2014 12:05 AM", "MM/DD/YYYY HH:MM:SS +UTC", 2026)
    assert p.hour == 0


def test_normalize_week_and_day_of_year():
    from palladian_spark.textproc.date_logic import parse_date
    # Java Calendar.DAY_OF_WEEK is 1=Sunday..7=Saturday; the reference
    # feeds the ISO digit straight in, landing one weekday EARLIER than
    # ISO (reproduced bit-for-bit; see date_logic module notes)
    assert parse_date("2010-W07-5", "YYYY-WW-D", 2026)[:3] == (2010, 2, 18)
    assert parse_date("2010-W07-1", "YYYY-WW-D", 2026)[:3] == (2010, 2, 21)
    # no day → Monday of the ISO week
    assert parse_date("2010-W07", "YYYY-WW", 2026)[:3] == (2010, 2, None)
    assert parse_date("2014-234", "YYYY-DDD", 2026)[:3] == (2014, 8, 22)
    assert parse_date("2014234", "YYYYDDD", 2026)[:3] == (2014, 8, 22)
    assert parse_date("20140902", "YYYYMMDD", 2026)[:3] == (2014, 9, 2)


def test_normalize_defensive_none():
    from palladian_spark.textproc.date_logic import parse_date
    assert parse_date("not a date", "MM/DD/YYYY", 2026) is None
    assert parse_date("2014", "NO SUCH FORMAT", 2026) is None


def test_format_gates_equivalence_fuzz():
    """The per-format prefilter gates are NECESSARY conditions: gated and
    ungated find_dates must agree on adversarial mixed strings."""
    import random

    from palladian_spark.textproc import dates as D

    fmt_rxs = {rx for rx, _ in D.DEFAULT_TAGGER_FORMATS}
    assert all(k in fmt_rxs for k in D._FORMAT_GATES)

    def find_ungated(text):
        saved = D._FORMAT_GATES
        D._FORMAT_GATES = {}
        try:
            return D.find_dates(text, D.DEFAULT_TAGGER_FORMATS)
        finally:
            D._FORMAT_GATES = saved

    rng = random.Random(45)
    pieces = ["2024-03-15", "3/15/2024", "15.03.2024", "March 15, 2024",
              "Mon Mar 15 10:30:00 2024", "2024-W11-5", "20240315",
              "2024075", "in 1987", "Customer C123", "hello world",
              "12/25", "Sept. 3", "10:30:00", "5. October 2019",
              "May 2020", "1.2.", "x_y_z", "'99-01-02",
              "Fri, 15 Mar 2024 10:30:00 GMT", "text. More text", "Ma 3",
              "MÄRZ 2001", "1. Mai '99", "Dez. 24", "ok 2024W052",
              "April 1st, 24", "23-Apr-99", "11_12_2013", "2024.03.15",
              "12.'99", "3/'98", "7-'77", "1_'01", "N7.", "v1.2 beta"]
    for _ in range(2500):
        t = " ".join(rng.choice(pieces)
                     for _ in range(rng.randint(1, 5)))
        assert D.find_dates(t, D.DEFAULT_TAGGER_FORMATS) == find_ungated(t), t
