"""Pronoun resolution: nearest preceding compatible mention."""

from palladian_spark.operators.coref import resolve_pronouns


def _mentions(spark, rows):
    return spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "start", "value", "tag"])


def _pronouns(spark, rows):
    return spark.createDataFrame(
        rows, ["conv_id", "turn_idx", "start", "pronoun"])


def test_nearest_preceding_and_type_compat(spark):
    m = _mentions(spark, [
        ("c1", 1, 0, "Alice", "PER"),
        ("c1", 1, 10, "Acme", "ORG"),
        ("c1", 2, 5, "Bob", "PER"),
        ("c1", 4, 0, "Paris", "LOC")])
    p = _pronouns(spark, [
        ("c1", 3, 0, "he"),     # nearest PER = Bob (turn 2)
        ("c1", 3, 8, "it"),     # ORG/LOC → Acme (turn 1); Paris is later
        ("c1", 5, 0, "there")])  # LOC → Paris
    out = {(r["turn_idx"], r["start"], r["pronoun"]):
           (r["antecedent"], r["ant_turn"], r["ant_start"])
           for r in resolve_pronouns(m, p).collect()}
    assert out[(3, 0, "he")] == ("Bob", 2, 5)
    assert out[(3, 8, "it")] == ("Acme", 1, 10)
    assert out[(5, 0, "there")] == ("Paris", 4, 0)


def test_same_position_mention_does_not_match(spark):
    # A mention at the pronoun's own (turn, start) is NOT preceding.
    m = _mentions(spark, [("c1", 1, 0, "Alice", "PER"),
                          ("c1", 2, 0, "Bob", "PER")])
    p = _pronouns(spark, [("c1", 2, 0, "she")])
    [r] = resolve_pronouns(m, p).collect()
    assert (r["antecedent"], r["ant_turn"]) == ("Alice", 1)


def test_unresolved_pronoun_kept_with_null(spark):
    m = _mentions(spark, [("c1", 5, 0, "Acme", "ORG")])
    p = _pronouns(spark, [("c1", 1, 0, "he"),    # nothing precedes
                          ("c2", 1, 0, "it")])   # other conversation
    out = {(r["conv_id"], r["pronoun"]): r["antecedent"]
           for r in resolve_pronouns(m, p).collect()}
    assert out[("c1", "he")] is None
    assert out[("c2", "it")] is None


def test_multi_tag_pronoun_picks_globally_nearest(spark):
    m = _mentions(spark, [("c1", 1, 0, "Alice", "PER"),
                          ("c1", 2, 0, "Acme", "ORG")])
    p = _pronouns(spark, [("c1", 3, 0, "they")])  # PER or ORG → Acme nearer
    [r] = resolve_pronouns(m, p).collect()
    assert (r["antecedent"], r["ant_turn"]) == ("Acme", 2)


def test_partitioning_invariance(spark):
    m = _mentions(spark, [("c%d" % c, t, s, "E%d" % s, tag)
                          for c in range(4) for t in range(1, 5)
                          for s, tag in [(0, "PER"), (7, "ORG")]])
    p = _pronouns(spark, [("c%d" % c, t, 3, pr)
                          for c in range(4) for t in range(1, 5)
                          for pr in ("he", "it", "they")])
    key = lambda r: tuple(r)
    a = sorted(map(key, resolve_pronouns(m, p).collect()))
    b = sorted(map(key, resolve_pronouns(m.repartition(9),
                                         p.repartition(5)).collect()))
    assert a == b and len(a) == 48
