"""JS-regex dialect routing (reference src/v4/pattern.js:18 — ``new RegExp(p)``).

The reference compiles ``pattern`` with a JavaScript ``RegExp``; this engine
runs patterns on java.util.regex (columnar ``rlike``) or Python ``re`` (the
dynamic kernel). The three dialects agree on the common core; this module

* TRANSLATES the JS-specific spellings that have an exact equivalent in the
  target dialect (``\\cJ`` control escapes, ``(?<name>...)`` named groups
  for Python, a bare ``\\0`` NUL), and
* RAISES :class:`RegexDialectError` at schema-compile time for constructs
  whose semantics would silently diverge between dialects: ``\\p{...}``
  property escapes, malformed ``\\u`` escapes, and ``\\u{...}`` — which is
  a code-point escape under the u flag but an identity-escaped 'u' with a
  quantifier in the reference's FLAGLESS ``new RegExp`` (Annex B legacy).

Kept deliberately conservative: anything in the shared core passes through
byte-for-byte, so existing Java/Python-targeted schemas are unaffected.
"""

from __future__ import annotations

import re

_HEX4 = re.compile(r"[0-9a-fA-F]{4}\Z")


class RegexDialectError(ValueError):
    """A pattern uses a construct with dialect-dependent semantics."""


def _translate(pattern: str, target: str) -> str:
    out = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            if i + 1 >= n:
                raise RegexDialectError(f"pattern {pattern!r}: trailing backslash")
            nxt = pattern[i + 1]
            if nxt == "u":
                if i + 2 < n and pattern[i + 2] == "{":
                    # \u{...} is AMBIGUOUS across dialects: with the u flag
                    # it is a code-point escape, but the reference compiles
                    # new RegExp(p) WITHOUT flags (src/v4/pattern.js:18),
                    # where Annex-B legacy semantics make it an identity-
                    # escaped 'u' with a {n} quantifier. Translating either
                    # way silently diverges from the other reading -> raise.
                    raise RegexDialectError(
                        f"pattern {pattern!r}: '\\u{{...}}' reads as a code-point "
                        "escape under the u flag but as 'u'+quantifier in the "
                        "reference's flagless RegExp; spell the intent "
                        "unambiguously (\\uXXXX for a code point, u{{n}} for "
                        "repetition)"
                    )
                if _HEX4.match(pattern[i + 2 : i + 6]):
                    out.append(pattern[i : i + 6])  # \uXXXX: common core
                    i += 6
                    continue
                raise RegexDialectError(
                    f"pattern {pattern!r}: '\\u' without 4 hex digits or {{...}} is "
                    "JS legacy identity-escape behavior with no portable equivalent; "
                    "escape the backslash if a literal was meant"
                )
            if nxt in "pP":
                raise RegexDialectError(
                    f"pattern {pattern!r}: unicode property escapes (\\{nxt}{{...}}) "
                    "have dialect-dependent property names (JS RegExp vs "
                    "java.util.regex) and no Python re support; spell the "
                    "character class explicitly"
                )
            if nxt == "c":
                letter = pattern[i + 2] if i + 2 < n else ""
                if not (letter.isascii() and letter.isalpha()):
                    raise RegexDialectError(
                        f"pattern {pattern!r}: '\\c' without a control letter relies "
                        "on JS legacy behavior; escape the backslash if a literal "
                        "was meant"
                    )
                out.append("\\x%02X" % (ord(letter.upper()) - 64))
                i += 3
                continue
            if (
                nxt == "k"
                and target == "python"
                and i + 2 < n
                and pattern[i + 2] == "<"
            ):
                j = pattern.find(">", i + 3)
                if j < 0:
                    raise RegexDialectError(f"pattern {pattern!r}: unterminated \\k<")
                out.append("(?P=" + pattern[i + 3 : j] + ")")
                i = j + 1
                continue
            if nxt == "0" and (i + 2 >= n or not pattern[i + 2].isdigit()):
                out.append("\\x00")  # bare \0 is NUL in JS; octal-error in Java
                i += 2
                continue
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if (
            not in_class
            and ch == "("
            and pattern[i : i + 3] == "(?<"
            and i + 3 < n
            and pattern[i + 3] not in "=!"
        ):
            j = pattern.find(">", i)
            if j < 0:
                raise RegexDialectError(f"pattern {pattern!r}: unterminated (?<")
            name = pattern[i + 3 : j]
            out.append(("(?P<" if target == "python" else "(?<") + name + ">")
            i = j + 1
            continue
        if ch == "[" and not in_class:
            in_class = True
        elif ch == "]" and in_class:
            in_class = False
        out.append(ch)
        i += 1
    return "".join(out)


def java_pattern(pattern: str) -> str:
    """Pattern string for java.util.regex (``Column.rlike``)."""
    return _translate(pattern, "java")


def python_pattern(pattern: str) -> "re.Pattern":
    """Compiled Python ``re`` pattern with JS spellings translated."""
    return re.compile(_translate(pattern, "python"))
