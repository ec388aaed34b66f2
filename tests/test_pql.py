"""PQL parser tests (modeled on reference pql/pql_test.go coverage)."""
import pytest

from featurebase_tpu.pql.ast import Call, Condition, Variable
from featurebase_tpu.pql.parser import ParseError, parse


def one(src):
    q = parse(src)
    assert len(q.calls) == 1
    return q.calls[0]


def test_set():
    c = one("Set(10, f=1)")
    assert c.name == "Set"
    assert c.args["_col"] == 10
    assert c.args["f"] == 1


def test_set_string_col():
    c = one("Set('abc', f=1)")
    assert c.args["_col"] == "abc"


def test_set_with_timestamp():
    c = one("Set(10, f=1, 2010-01-02T03:04)")
    assert c.args["_timestamp"] == "2010-01-02T03:04"


def test_row():
    c = one("Row(f=42)")
    assert c.name == "Row" and c.args["f"] == 42


def test_row_key():
    c = one("Row(f=\"blue\")")
    assert c.args["f"] == "blue"
    c = one("Row(f='blue')")
    assert c.args["f"] == "blue"
    c = one("Row(f=blue)")
    assert c.args["f"] == "blue"


def test_row_conditions():
    assert one("Row(f > 5)").args["f"] == Condition(">", 5)
    assert one("Row(f >= 5)").args["f"] == Condition(">=", 5)
    assert one("Row(f < 5)").args["f"] == Condition("<", 5)
    assert one("Row(f <= 5)").args["f"] == Condition("<=", 5)
    assert one("Row(f != 5)").args["f"] == Condition("!=", 5)
    assert one("Row(f == 5)").args["f"] == Condition("==", 5)
    assert one("Row(f != null)").args["f"] == Condition("!=", None)


def test_conditional_between():
    c = one("Row(5 < f < 10)")
    cond = c.args["f"]
    assert cond.op == "betw" and cond.value == [5, 10]
    assert cond.lo_strict and cond.hi_strict
    c = one("Row(5 <= f <= 10)")
    cond = c.args["f"]
    assert not cond.lo_strict and not cond.hi_strict


def test_between_op():
    c = one("Row(f >< [5, 10])")
    cond = c.args["f"]
    assert cond.op == "betw" and cond.value == [5, 10]


def test_nested():
    c = one("Count(Intersect(Row(a=1), Row(b=2)))")
    assert c.name == "Count"
    inner = c.children[0]
    assert inner.name == "Intersect"
    assert [ch.name for ch in inner.children] == ["Row", "Row"]
    assert inner.children[0].args["a"] == 1


def test_topn():
    c = one("TopN(f, n=5)")
    assert c.args["_field"] == "f" and c.args["n"] == 5
    c = one("TopN(f, Row(g=2), n=3)")
    assert c.children[0].name == "Row"


def test_groupby():
    c = one("GroupBy(Rows(a), Rows(b), limit=10, aggregate=Sum(field=v))")
    assert [ch.name for ch in c.children] == ["Rows", "Rows"]
    assert c.args["limit"] == 10
    agg = c.args["aggregate"]
    assert isinstance(agg, Call) and agg.name == "Sum"
    assert agg.args["_field"] == "v"


def test_store():
    c = one("Store(Row(f=1), g=2)")
    assert c.name == "Store"
    assert c.children[0].name == "Row"
    assert c.args["g"] == 2


def test_multiple_calls():
    q = parse("Set(1, f=1) Set(2, f=1) Count(Row(f=1))")
    assert [c.name for c in q.calls] == ["Set", "Set", "Count"]


def test_list_values():
    c = one("Rows(f, in=[1, 2, 3])")
    assert c.args["in"] == [1, 2, 3]


def test_const_row():
    c = one("ConstRow(columns=[1, 2, 3])")
    assert c.args["columns"] == [1, 2, 3]


def test_bools_and_null():
    c = one("Row(f=true)")
    assert c.args["f"] is True
    c = one("Row(f=false)")
    assert c.args["f"] is False
    c = one("Row(f=null)")
    assert c.args["f"] is None


def test_decimal():
    c = one("Row(f > 1.5)")
    assert c.args["f"] == Condition(">", 1.5)
    c = one("Row(f < -2.25)")
    assert c.args["f"] == Condition("<", -2.25)


def test_negative():
    c = one("Row(f=-10)")
    assert c.args["f"] == -10


def test_time_range():
    c = one("Row(f=1, from='2010-01-01T00:00', to='2011-01-01T00:00')")
    assert c.args["from"] == "2010-01-01T00:00"
    assert c.args["to"] == "2011-01-01T00:00"


def test_variable():
    c = one("Rows(f, previous=$prev)")
    assert c.args["previous"] == Variable("prev")


def test_apply():
    c = one('Apply(Row(f=1), "count x")')
    assert c.children[0].name == "Row"
    assert c.args["_ivy"] == "count x"


def test_parse_error():
    with pytest.raises(ParseError):
        parse("Row(f=")
    with pytest.raises(ParseError):
        parse("NotACall")


def test_options_wrapper():
    c = one("Options(Row(f=1), shards=[0, 2])")
    assert c.name == "Options"
    assert c.children[0].name == "Row"
    assert c.args["shards"] == [0, 2]
