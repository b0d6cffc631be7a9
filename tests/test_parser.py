"""Golden-tree tests for the query parser, mirroring the reference's manual
smoke cases (/root/reference/search_engine/preprocessing.py:149-193)."""

import pytest

from search_engine_spark.plans.parser import (
    QueryNode,
    SearchMode,
    build_query_tree,
    parse_query,
    shunting_yard,
)


def tree_repr(node):
    if node is None:
        return None
    v = node.value.value if isinstance(node.value, SearchMode) else node.value
    if node.left is None and node.right is None:
        return v
    return (v, tree_repr(node.left), tree_repr(node.right))


def test_phrase_and_parens():
    t = parse_query(['"', "test", "this", '"', "AND", "(", "test2", "OR", "test3", ")"])
    assert tree_repr(t) == ("AND", ["test", "this"], ("OR", "test2", "test3"))


def test_precedence_and_over_or():
    t = parse_query(['"', "test", "this", '"', "AND", "test2", "OR", "test3"])
    assert tree_repr(t) == ("OR", ("AND", ["test", "this"], "test2"), "test3")


def test_implicit_and():
    t = parse_query(["test", "this", "AND", "test2", "OR", "test3"])
    assert tree_repr(t) == (
        "OR",
        ("AND", ("AND", "test", "this"), "test2"),
        "test3",
    )


def test_not_unary():
    t = parse_query(["test", "this", "AND", "test2", "OR", "NOT", "test3"])
    assert tree_repr(t) == (
        "OR",
        ("AND", ("AND", "test", "this"), "test2"),
        ("NOT", "test3", None),
    )


def test_lowercase_and_is_operator():
    # tokenizer lowercases; "and" matches op table case-insensitively
    t = parse_query(["test", "and", "test"])
    assert tree_repr(t) == ("AND", "test", "test")


def test_phrase_keeps_operator_words():
    t = parse_query(['"', "test", "and", "test", '"'])
    assert tree_repr(t) == ["test", "and", "test"]


def test_mismatched_parens_raises():
    with pytest.raises(ValueError):
        shunting_yard([")", "burj", "test"])


def test_no_implicit_and_before_phrase_quirk():
    # parity quirk: term followed by a phrase gets NO implicit AND; the
    # dangling operand is dropped when the tree is built
    t = parse_query(["a", '"', "b", "c", '"'])
    assert tree_repr(t) == ["b", "c"]


def test_second_phrase_stray_quote_quirk():
    out = shunting_yard(['"', "a", "b", '"', "OR", '"', "c", "d", '"'])
    assert out[0] == ["a", "b"]
    assert out[1] == ['"', "c", "d"]  # stray quote inherited (parity)


def test_implicit_and_chain():
    t = parse_query(["x", "y", "z"])
    assert tree_repr(t) == ("AND", ("AND", "x", "y"), "z")
