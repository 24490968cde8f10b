from sparketl.dialect import transpile


def test_brackets():
    assert transpile("SELECT [a b] FROM [t]") == "SELECT `a b` FROM `t`"


def test_top_to_limit():
    assert (
        transpile("SELECT TOP 10 x FROM t ORDER BY x")
        == "SELECT x FROM t ORDER BY x LIMIT 10"
    )


def test_function_renames():
    out = transpile("SELECT ISNULL(a, b), LEN(c), CHARINDEX('x', d), GETDATE() FROM t")
    assert "coalesce(a, b)" in out
    assert "length(c)" in out
    assert "locate('x', d)" in out
    assert "current_timestamp()" in out


def test_strings_and_comments_untouched():
    sql = "SELECT 'LEN(x) [not] TOP 5' AS s -- ISNULL(comment)\nFROM t"
    out = transpile(sql)
    assert "'LEN(x) [not] TOP 5'" in out
    assert "-- ISNULL(comment)" in out


def test_word_boundaries():
    # LENGTH is not LEN; TOPIC is not TOP
    assert transpile("SELECT LENGTH(a), topic FROM t") == "SELECT LENGTH(a), topic FROM t"


def test_trailing_semicolon_with_top():
    assert transpile("SELECT TOP 3 a FROM t;") == "SELECT a FROM t LIMIT 3"


def test_isnull_not_renamed_without_call():
    # bare word (e.g. column named isnull) survives
    assert transpile("SELECT isnull FROM t") == "SELECT isnull FROM t"


def test_top_parenthesized():
    assert transpile("SELECT TOP (7) a FROM t") == "SELECT a FROM t LIMIT 7"


def test_distinct_top():
    assert (
        transpile("SELECT DISTINCT TOP 3 a FROM t ORDER BY a")
        == "SELECT DISTINCT a FROM t ORDER BY a LIMIT 3"
    )


def test_top_in_subquery_raises():
    import pytest

    from sparketl.dialect import DialectError

    with pytest.raises(DialectError, match="subquery"):
        transpile("SELECT * FROM (SELECT TOP 3 a FROM t) s JOIN u ON s.a = u.a")


def test_repeated_top_raises():
    import pytest

    from sparketl.dialect import DialectError

    with pytest.raises(DialectError, match="multiple TOP"):
        transpile("SELECT TOP 3 a FROM t UNION ALL SELECT TOP 4 b FROM u")


def test_plus_string_concat():
    assert (
        transpile("SELECT a + ' / ' + b FROM t")
        == "SELECT a || ' / ' || b FROM t"
    )
    assert transpile("SELECT 'x' + a FROM t") == "SELECT 'x' || a FROM t"


def test_plus_numeric_untouched():
    assert transpile("SELECT a + b, 1 + 2 FROM t") == "SELECT a + b, 1 + 2 FROM t"


def test_top_as_identifier_after_select_distinct():
    # COUNT(DISTINCT top): 'top' here is a column, not the TOP keyword
    assert (
        transpile("SELECT COUNT(DISTINCT top) FROM t")
        == "SELECT COUNT(DISTINCT top) FROM t"
    )
