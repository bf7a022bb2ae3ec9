"""FLAG_WILDCARD goldens ported verbatim from the reference
(xapian-core/tests/queryparsertest.cc:887-1032,
test_qp_flag_wildcard1/2/3): explicit 'term*' right truncation,
expanded at parse time against a term dictionary (set_database), with
love/hate interaction and the set_max_wildcard_expansion cap."""

import pytest

from xapian_spark.query import ops
from xapian_spark.query.parser import QueryParser, describe

DB1 = ["abc", "main", "muscat", "muscle", "musclebound", "muscular",
       "mutton"]

# (query, default_op, expected description) — the reference test's
# own sequence; 'and' cases follow its set_default_op(OP_AND) switch.
W1 = [
    ("ab*", "or", "abc@1"),
    ("muscle*", "or", "(muscle@1 SYNONYM musclebound@1)"),
    ("meat*", "or", ""),
    ("musc*", "or",
     "(muscat@1 SYNONYM muscle@1 SYNONYM musclebound@1 SYNONYM"
     " muscular@1)"),
    ("mutt*", "or", "mutton@1"),
    ("+mai* main", "or", "(main@1 AND_MAYBE main@2)"),
    ("foo* main", "or", "main@2"),
    ("main foo*", "or", "main@1"),
    ("+foo* main", "or", ""),
    ("main +foo*", "or", ""),
    ("foo* +main", "or", "main@2"),
    ("+main foo*", "or", "main@1"),
    ("+foo* +main", "or", ""),
    ("+main +foo*", "or", ""),
    ("foo* mai", "or", "mai@2"),
    ("mai foo*", "or", "mai@1"),
    ("+foo* mai", "or", ""),
    ("mai +foo*", "or", ""),
    ("foo* +mai", "or", "mai@2"),
    ("+mai foo*", "or", "mai@1"),
    ("+foo* +mai", "or", ""),
    ("+mai +foo*", "or", ""),
    ("-foo* main", "or", "main@2"),
    ("main -foo*", "or", "main@1"),
    ("main -foo* -bar", "or", "(main@1 AND_NOT bar@3)"),
    ("main -bar -foo*", "or", "(main@1 AND_NOT bar@2)"),
    ("foo* main", "and", ""),
    ("main foo*", "and", ""),
    ("+foo* main", "and", ""),
    ("main +foo*", "and", ""),
    ("-foo* main", "and", "main@2"),
    ("main -foo*", "and", "main@1"),
    ("foo* -main", "or", ""),
    ("abc muscl* main", "and",
     "((abc@1 AND (muscle@2 SYNONYM musclebound@2)) AND main@3)"),
]


@pytest.mark.parametrize("query,default_op,expected", W1)
def test_qp_flag_wildcard1(query, default_op, expected):
    qp = QueryParser(stemmer=None, default_op=default_op)
    qp.set_database(DB1)
    q = qp.parse_query(query, wildcard=True)
    assert describe(q) == expected, query


def test_qp_flag_wildcard2_prefixes():
    qp = QueryParser(stemmer=None)
    qp.set_database(["Aheinlein", "Ahuxley", "hello"])
    qp.add_prefix("author", "A")
    q = qp.parse_query("author:h*", wildcard=True)
    assert describe(q) == "(Aheinlein@1 SYNONYM Ahuxley@1)"
    q = qp.parse_query("author:h* test", wildcard=True)
    assert describe(q) == \
        "((Aheinlein@1 SYNONYM Ahuxley@1) OR test@2)"


def test_qp_flag_wildcard3_max_expansion():
    qp = QueryParser(stemmer=None)
    qp.set_database(DB1)
    qp.set_max_wildcard_expansion(2)
    # at the cap: fine
    q = qp.parse_query("muscle*", wildcard=True)
    assert describe(q) == "(muscle@1 SYNONYM musclebound@1)"
    # over the cap: WildcardError
    with pytest.raises(ops.WildcardError):
        qp.parse_query("musc*", wildcard=True)
    qp.set_max_wildcard_expansion(0)  # unlimited again
    assert describe(qp.parse_query("musc*", wildcard=True)).count(
        "SYNONYM") == 3


def test_wildcard_without_database_compiles_to_wildcard_op():
    """No set_database → 1.3 behavior: an ops.Wildcard node expanded at
    compile time against the index term dictionary."""
    qp = QueryParser(stemmer=None)
    q = qp.parse_query("wind*", wildcard=True)
    assert isinstance(q, ops.Wildcard)
    assert q.prefix == "wind"


def test_wildcard_flag_off_star_is_punctuation():
    qp = QueryParser(stemmer=None)
    q = qp.parse_query("mutt*")
    assert describe(q) == "mutt@1"
