r"""Text front-end for label matchers: ``{name=~"v.*", other!="x"}`` →
``list[LabelMatcher]`` (VERDICT r8 #6).

The reference takes matcher STRUCTS at its boundary; the textual selector
syntax lives in the external Go engine, which lowers Prometheus matchers
to the struct form one by one
(/root/reference/tagtreego/helper.go:38-67 toTagTreeLabelMatcher). This
module brings that boundary in-engine so the Spark engine is driveable
from a plain string, with the same lowering target (``LabelMatcher``) and
the same construction-time regex-subset validation (``LabelMatcher``'s
``__post_init__`` runs ``_validate_regex_subset`` on =~ / !~ values, so a
parsed selector can never smuggle an engine-divergent pattern past the
check).

Grammar (PromQL vector-selector matcher list, extended with the ordering
ops the engine's matcher algebra supports as M5–M8 —
/root/reference/src/index/index_tree.cpp:112-157):

    selector := '{' [matcher (',' matcher)* [',']] '}'
    matcher  := label_name op string
    op       := '=' | '!=' | '=~' | '!~' | '<' | '<=' | '>' | '>='
    string   := '"' (char | escape)* '"'      Go-style escapes
              | "'" (char | escape)* "'"
              | '`' raw chars '`'             no escapes (raw string)

Label names follow PromQL: ``[a-zA-Z_][a-zA-Z0-9_]*``. Escapes supported
in quoted strings: ``\\ \" \' \n \t \r`` plus ``\xNN`` / ``\uNNNN``;
anything else is an error (loud beats silently-divergent). A trailing
comma is allowed, duplicate-name matchers are allowed (PromQL semantics:
they conjoin, e.g. ``{x>"a", x<"f"}`` is a range).
"""

from __future__ import annotations

from tagtree_spark.tsdb.matchers import LabelMatcher, MatchOp

# longest-first so '!=' wins over '!', '<=' over '<'
_OPS = ["!=", "!~", "=~", "<=", ">=", "=", "<", ">"]
_OP_MAP = {op.value: op for op in MatchOp}

_ESCAPES = {"\\": "\\", '"': '"', "'": "'", "n": "\n", "t": "\t", "r": "\r"}


class SelectorParseError(ValueError):
    def __init__(self, selector: str, pos: int, why: str):
        super().__init__(f"selector {selector!r} at index {pos}: {why}")
        self.pos = pos


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in " \t\n\r":
        i += 1
    return i


def _parse_name(s: str, i: int) -> tuple[str, int]:
    start = i
    if i >= len(s) or not (s[i].isalpha() or s[i] == "_"):
        raise SelectorParseError(s, i, "expected a label name ([a-zA-Z_]...)")
    while i < len(s) and (s[i].isalnum() or s[i] == "_"):
        i += 1
    return s[start:i], i


def _parse_string(s: str, i: int) -> tuple[str, int]:
    if i >= len(s) or s[i] not in "\"'`":
        raise SelectorParseError(s, i, "expected a quoted string value")
    quote = s[i]
    i += 1
    out: list[str] = []
    while i < len(s):
        c = s[i]
        if c == quote:
            return "".join(out), i + 1
        if quote != "`" and c == "\\":
            if i + 1 >= len(s):
                raise SelectorParseError(s, i, "dangling escape at end of string")
            nxt = s[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt in ("x", "u"):
                width = 2 if nxt == "x" else 4
                hexs = s[i + 2 : i + 2 + width]
                if len(hexs) != width or any(
                    h not in "0123456789abcdefABCDEF" for h in hexs
                ):
                    raise SelectorParseError(s, i, f"malformed \\{nxt} escape")
                out.append(chr(int(hexs, 16)))
                i += 2 + width
                continue
            raise SelectorParseError(
                s, i, f"unknown escape '\\{nxt}' (supported: \\\\ \\\" \\' \\n \\t \\r \\xNN \\uNNNN)"
            )
        out.append(c)
        i += 1
    raise SelectorParseError(s, i, f"unterminated string (opened with {quote})")


def _parse_op(s: str, i: int) -> tuple[MatchOp, int]:
    for tok in _OPS:
        if s.startswith(tok, i):
            return _OP_MAP[tok], i + len(tok)
    raise SelectorParseError(
        s, i, "expected a matcher op (= != =~ !~ < <= > >=)"
    )


def parse_selector(selector: str) -> list[LabelMatcher]:
    """``'{a="x", b=~"y.*"}'`` → ``[LabelMatcher(EQL,'a','x'),
    LabelMatcher(EQL_REGEX,'b','y.*')]``. Regex values are subset-validated
    by the LabelMatcher constructor; syntax errors raise
    :class:`SelectorParseError` with the failing index."""
    s = selector
    i = _skip_ws(s, 0)
    if i >= len(s) or s[i] != "{":
        raise SelectorParseError(s, i, "selector must start with '{'")
    i = _skip_ws(s, i + 1)
    out: list[LabelMatcher] = []
    while True:
        if i < len(s) and s[i] == "}":
            i += 1
            break
        name, i = _parse_name(s, i)
        i = _skip_ws(s, i)
        op, i = _parse_op(s, i)
        i = _skip_ws(s, i)
        value, i = _parse_string(s, i)
        out.append(LabelMatcher(op, name, value))
        i = _skip_ws(s, i)
        if i < len(s) and s[i] == ",":
            i = _skip_ws(s, i + 1)
            continue
        if i < len(s) and s[i] == "}":
            i += 1
            break
        raise SelectorParseError(s, i, "expected ',' or '}' after a matcher")
    i = _skip_ws(s, i)
    if i != len(s):
        raise SelectorParseError(s, i, "trailing characters after '}'")
    return out


def format_selector(matchers: list[LabelMatcher]) -> str:
    """Inverse of :func:`parse_selector` (canonical double-quoted form):
    ``parse_selector(format_selector(ms)) == ms`` for every matcher list —
    the round-trip property test's contract."""
    parts = []
    for m in matchers:
        v = m.value
        for raw, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\t", "\\t"), ("\r", "\\r")):
            v = v.replace(raw, esc)
        parts.append(f'{m.name}{m.op.value}"{v}"')
    return "{" + ", ".join(parts) + "}"
