"""URL + JSON-Pointer utilities for $ref resolution.

Behavioral model: reference src/url.js:6-41 (normalize / resolve / unescape).

Documented divergence (SURVEY.md §2.3): the reference's pointer unescape
uses a non-global, wrongly-ordered string replace (``~0`` before ``~1``,
no /g flag — reference src/url.js:39-41), which is RFC-6901-incorrect for
repeated or compound escapes. This module implements RFC 6901 correctly
(``~1`` -> '/' first, then ``~0`` -> '~', all occurrences). The reference's
own fixtures never exercise the quirk.
"""

from __future__ import annotations

from typing import Any, List, Tuple
from urllib.parse import urldefrag, urljoin


class PointerError(KeyError):
    """A JSON Pointer did not resolve within the document."""


def split_ref(ref: str) -> Tuple[str, str]:
    """Split a $ref into (resource_url, fragment_pointer)."""
    url, frag = urldefrag(ref)
    return url, frag


def resolve_url(base: str, ref: str) -> str:
    """Resolve ``ref`` against ``base`` (RFC 3986 join, fragment kept)."""
    if not base:
        return ref
    return urljoin(base, ref)


def normalize_url(url: str) -> str:
    """Normalize a resource URL for use as a refs-table key: strip any
    fragment and a trailing slash ambiguity is left alone (keys must be
    pre-normalized, as the reference requires — src/context.js:15)."""
    base, _ = urldefrag(url)
    return base


def unescape_token(token: str) -> str:
    """RFC 6901 token unescape: '~1' -> '/', then '~0' -> '~'."""
    return token.replace("~1", "/").replace("~0", "~")


def pointer_tokens(fragment: str) -> List[str]:
    """Parse a fragment like '/definitions/a~1b' into reference tokens.

    Empty fragment or '/' -> whole document.
    """
    if fragment in ("", "/"):
        return []
    if fragment.startswith("/"):
        fragment = fragment[1:]
    return [unescape_token(t) for t in fragment.split("/")]


def walk_pointer(doc: Any, fragment: str) -> Any:
    """Resolve a JSON Pointer fragment within ``doc``."""
    node = doc
    for token in pointer_tokens(fragment):
        if isinstance(node, dict):
            if token not in node:
                raise PointerError(f"pointer token {token!r} not found (fragment {fragment!r})")
            node = node[token]
        elif isinstance(node, list):
            try:
                idx = int(token)
            except ValueError:
                raise PointerError(f"non-numeric index {token!r} into array (fragment {fragment!r})")
            if not (0 <= idx < len(node)):
                raise PointerError(f"index {idx} out of range (fragment {fragment!r})")
            node = node[idx]
        else:
            raise PointerError(f"cannot descend into scalar at {token!r} (fragment {fragment!r})")
    return node
