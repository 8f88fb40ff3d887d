"""JS-regex dialect routing (reference src/v4/pattern.js:18 — ``new RegExp(p)``).

The reference compiles ``pattern`` with a JavaScript ``RegExp``; this engine
runs patterns on java.util.regex (columnar ``rlike``) or Python ``re`` (the
dynamic kernel). The three dialects agree on the common core; this module

* TRANSLATES the JS-specific spellings that have an exact equivalent in the
  target dialect (``\\cJ`` control escapes, ``(?<name>...)`` named groups
  for Python, a bare ``\\0`` NUL), and
* reproduces the reference's FLAGLESS-RegExp Annex-B reading of the
  legacy escapes (default, reference-faithful): ``new RegExp(p)`` without
  the ``u`` flag makes ``\\p``/``\\P``/dangling ``\\u`` IDENTITY escapes —
  they match the literal letter — and a ``{...}`` that is not a valid
  quantifier is a literal brace sequence. So ``\\p{L}`` matches the text
  ``p{L}``, ``\\u{2}`` matches ``uu`` ('u' quantified), and ``\\u{GG}``
  matches ``u{GG}`` — exactly what the reference computes. The translator
  emits the bare letter and escapes non-quantifier braces (``\\{``/``\\}``,
  a no-op for Python and required for java.util.regex, which rejects bare
  ``{`` outside quantifiers).
* with ``strict=True``, RAISES :class:`RegexDialectError` at schema-compile
  time for those same constructs instead — for deployments that would
  rather reject a schema than reproduce Annex-B legacy semantics.

Deliberate divergence kept strict-only: ``\\c`` without a control letter
(Annex-B reads it as a literal backslash + 'c' OUTSIDE classes but as a
data character inside them — translating both contexts faithfully buys
nothing for real schemas, so it raises in both modes).

Anything in the shared core passes through byte-for-byte, so existing
Java/Python-targeted schemas are unaffected.
"""

from __future__ import annotations

import re

_HEX4 = re.compile(r"[0-9a-fA-F]{4}\Z")
#: valid quantifier brace forms: {n}, {n,}, {n,m} (ECMA-262 + Java + re)
_QUANT = re.compile(r"\{\d+(?:,\d*)?\}")


class RegexDialectError(ValueError):
    """A pattern uses a construct with dialect-dependent semantics."""


def _translate(pattern: str, target: str, strict: bool = False) -> str:
    out = []
    i, n = 0, len(pattern)
    in_class = False
    # does the previous token form a quantifiable atom? A VALID-form
    # braced quantifier with nothing to repeat ('{2}' at pattern start
    # or after '|'/'(') is an Annex-B InvalidBracedQuantifier — the
    # reference's flagless RegExp rejects it at schema-COMPILE time,
    # so deferring to a runtime rlike failure (or a bare re.error)
    # mid-query is wrong in both modes (ADVICE r8).
    prev_atom = False
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            if i + 1 >= n:
                raise RegexDialectError(f"pattern {pattern!r}: trailing backslash")
            nxt = pattern[i + 1]
            if nxt == "u":
                if _HEX4.match(pattern[i + 2 : i + 6]):
                    out.append(pattern[i : i + 6])  # \uXXXX: common core
                    i += 6
                    prev_atom = True
                    continue
                if strict and i + 2 < n and pattern[i + 2] == "{":
                    # \u{...} is a code-point escape ONLY under the u flag;
                    # the reference compiles new RegExp(p) WITHOUT flags
                    # (src/v4/pattern.js:18)
                    raise RegexDialectError(
                        f"pattern {pattern!r}: '\\u{{...}}' reads as a code-point "
                        "escape under the u flag but as 'u'+quantifier in the "
                        "reference's flagless RegExp; spell the intent "
                        "unambiguously (\\uXXXX for a code point, u{{n}} for "
                        "repetition)"
                    )
                if strict:
                    raise RegexDialectError(
                        f"pattern {pattern!r}: '\\u' without 4 hex digits or "
                        "{...} is JS legacy identity-escape behavior; escape "
                        "the backslash if a literal was meant"
                    )
                # Annex-B identity escape: flagless '\u' is the literal
                # letter; a following '{...}' falls to the brace scanner
                # below ({2} quantifies the 'u', {GG} is literal braces) —
                # the reference's exact reading
                out.append("u")
                i += 2
                prev_atom = True
                continue
            if nxt in "pP":
                if strict:
                    raise RegexDialectError(
                        f"pattern {pattern!r}: unicode property escapes "
                        f"(\\{nxt}{{...}}) have dialect-dependent property "
                        "names (JS RegExp vs java.util.regex) and no Python "
                        "re support; spell the character class explicitly"
                    )
                # Annex-B identity escape: flagless '\p' matches 'p'
                # (reference src/v4/pattern.js:18 — property escapes only
                # exist under the u flag)
                out.append(nxt)
                i += 2
                prev_atom = True
                continue
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
                prev_atom = True
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
                prev_atom = True
                continue
            if nxt == "0" and (i + 2 >= n or not pattern[i + 2].isdigit()):
                out.append("\\x00")  # bare \0 is NUL in JS; octal-error in Java
                i += 2
                prev_atom = True
                continue
            out.append(pattern[i : i + 2])
            i += 2
            prev_atom = True
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
            prev_atom = False
            continue
        if ch == "[" and not in_class:
            in_class = True
        elif ch == "]" and in_class:
            in_class = False
            prev_atom = True
        elif ch in "{}" and not in_class:
            # Annex-B ExtendedPatternCharacter: a brace that does not form
            # a valid quantifier is a LITERAL in the reference's flagless
            # RegExp. Python agrees; java.util.regex rejects a bare '{'
            # ("Illegal repetition") — escape it for both so the three
            # dialects read identically. Valid quantifiers copy verbatim.
            m = _QUANT.match(pattern, i) if ch == "{" else None
            if m:
                if not prev_atom:
                    raise RegexDialectError(
                        f"pattern {pattern!r}: quantifier {m.group(0)!r} has "
                        "nothing to repeat — the reference's flagless RegExp "
                        "rejects this at compile time (Annex-B "
                        "InvalidBracedQuantifier)"
                    )
                out.append(m.group(0))
                i = m.end()
                continue
            out.append("\\" + ch)
            i += 1
            prev_atom = True
            continue
        if not in_class and ch != "[":
            # '(' opens a group and '|' starts a fresh alternative —
            # nothing quantifiable precedes the next term; every other
            # pattern character is itself an atom
            prev_atom = ch not in "(|"
        out.append(ch)
        i += 1
    return "".join(out)


def java_pattern(pattern: str, strict: bool = False) -> str:
    """Pattern string for java.util.regex (``Column.rlike``). Default is
    the reference-faithful Annex-B reading of legacy escapes;
    ``strict=True`` raises :class:`RegexDialectError` for them instead."""
    return _translate(pattern, "java", strict=strict)


def python_pattern(pattern: str, strict: bool = False) -> "re.Pattern":
    """Compiled Python ``re`` pattern with JS spellings translated (same
    ``strict`` contract as :func:`java_pattern`)."""
    return re.compile(_translate(pattern, "python", strict=strict))
