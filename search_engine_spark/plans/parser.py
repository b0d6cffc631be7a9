"""Boolean query language: tokens -> postfix -> query tree.

Driver-side, per-query, tiny — pure Python is the right tool here.  The
grammar and all of its quirks replicate the reference
(``/root/reference/search_engine/preprocessing.py:47-146``):

* precedence NOT(3) > AND(2) > OR(1); symbol aliases ``-``/``&``/``|``
* ``"`` toggles phrase capture; the phrase is emitted as a *list* token
* implicit AND is inserted between two adjacent bare terms (``:77-80,
  113-120``) — but NOT between a term and a following phrase/paren
* mismatched ``)`` raises ``ValueError`` (``:108-109``)
* quirk kept for parity: the closing quote is appended to the *reset*
  phrase buffer, so a second phrase in the same query inherits a stray
  ``"`` token (``:61-68``); fixtures cover this
* quirk kept for parity: operand count is never validated — extra operands
  are silently dropped when the tree is built (``:146`` returns the stack
  top), e.g. ``a "b c"`` evaluates to just the phrase
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional, Union


class SearchMode(enum.Enum):
    AND = "AND"
    OR = "OR"
    NOT = "NOT"
    PHRASE = "PHRASE"
    QUERY_EVALUATOR = "QUERY_EVALUATOR"
    SEMANTIC = "SEMANTIC"  # reference utils.py SearchMode.SEMANTIC

    def __repr__(self) -> str:  # pragma: no cover
        return self.value


PRECEDENCE = {"NOT": 3, "-": 3, "AND": 2, "&": 2, "OR": 1, "|": 1}
_OP_MODE = {
    "NOT": SearchMode.NOT,
    "-": SearchMode.NOT,
    "AND": SearchMode.AND,
    "&": SearchMode.AND,
    "OR": SearchMode.OR,
    "|": SearchMode.OR,
}

Token = Union[str, list]


@dataclass
class QueryNode:
    value: Union[str, list, SearchMode]
    left: Optional["QueryNode"] = None
    right: Optional["QueryNode"] = None


def shunting_yard(tokens: list[str]) -> list[Token]:
    ops: list[str] = []
    out: list[Token] = []
    in_phrase = False
    phrase: list[str] = []
    pending_and = False

    i = 0
    while i < len(tokens):
        tok = tokens[i]

        if in_phrase:
            if tok.upper() == '"':
                out.append(phrase)
                in_phrase = False
                phrase = []
            phrase.append(tok)  # parity quirk: closing quote lands in the
            i += 1              # reset buffer (reference :61-68)
            continue

        if tok.upper() == '"':
            in_phrase = True
            i += 1
            continue

        if pending_and:
            tok = "AND"
            i -= 1
            pending_and = False

        up = tok.upper()
        if up in PRECEDENCE:
            while ops and ops[-1] != "(" and (
                PRECEDENCE[ops[-1].upper()] > PRECEDENCE[up]
                or (PRECEDENCE[ops[-1].upper()] == PRECEDENCE[up] and up != "NOT")
            ):
                out.append(ops.pop())
            ops.append(up)
        elif tok == "(":
            ops.append(tok)
        elif tok == ")":
            while ops and ops[-1] != "(":
                out.append(ops.pop())
            if not ops:
                raise ValueError("Malformed query. Mismatched parentheses")
            ops.pop()
        else:
            nxt = tokens[i + 1] if i + 1 < len(tokens) else None
            if (
                nxt is not None
                and nxt.upper() not in PRECEDENCE
                and nxt not in ("(", ")")
                and nxt != '"'
            ):
                pending_and = True
            out.append(tok)
        i += 1

    while ops:
        out.append(ops.pop())
    return out


def build_query_tree(postfix: list[Token]) -> QueryNode:
    stack: list[QueryNode] = []
    for tok in postfix:
        if isinstance(tok, list) or tok not in PRECEDENCE:
            stack.append(QueryNode(tok))
        elif tok in ("NOT", "-"):
            stack.append(QueryNode(_OP_MODE[tok], stack.pop(), None))
        else:
            right = stack.pop()
            left = stack.pop()
            stack.append(QueryNode(_OP_MODE[tok], left, right))
    return stack[-1]


def parse_query(tokens: list[str]) -> QueryNode:
    return build_query_tree(shunting_yard(tokens))
