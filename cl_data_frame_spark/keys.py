"""Ordered, unique key registry.

Mirrors the reference's ``ordered-keys`` bidirectional key<->position index
(cl-data-frame.lisp:173-177): insertion order defines column order
(``add-key!`` assigns the running count as the next index,
cl-data-frame.lisp:217-225), duplicates raise ``DuplicateKey``
(cl-data-frame.lisp:222-223), and missing-key lookups raise ``KeyNotFound``
listing the valid keys (cl-data-frame.lisp:205-211).

Spark permits duplicate column names, so this guard is engine-level
(SURVEY.md §1.7). Keys are Python strings (the reference used Lisp symbols).
"""

from __future__ import annotations

from collections.abc import Iterable

from .errors import DuplicateKey, KeyNotFound


class OrderedKeys:
    """Bidirectional key<->index registry with uniqueness enforcement."""

    __slots__ = ("_index",)

    def __init__(self, keys: Iterable[str] = ()):
        self._index: dict[str, int] = {}
        for key in keys:
            self.add(key)

    def add(self, key: str) -> int:
        """Register *key* at the next position (cl-data-frame.lisp:217-225)."""
        if not isinstance(key, str):
            raise TypeError(f"Keys must be strings, got {type(key).__name__}: {key!r}")
        if key in self._index:
            raise DuplicateKey(key)
        position = len(self._index)
        self._index[key] = position
        return position

    def index(self, key: str) -> int:
        """Position of *key*; KeyNotFound lists valid keys (cl-data-frame.lisp:205-211)."""
        try:
            return self._index[key]
        except KeyError:
            raise KeyNotFound(key, self.keys()) from None

    def __contains__(self, key: str) -> bool:
        return key in self._index

    def keys(self) -> list[str]:
        """Keys in insertion order (cl-data-frame.lisp:198-203)."""
        return list(self._index)

    def __len__(self) -> int:
        return len(self._index)

    def __iter__(self):
        return iter(self._index)

    def copy(self) -> "OrderedKeys":
        new = OrderedKeys()
        new._index = dict(self._index)
        return new

    def resolve_position(self, pos: int) -> str:
        """Key at integer position; negatives count from the end
        (test evidence: ``(columns df -2)``, cl-data-frame-tests.lisp:54)."""
        keys = self.keys()
        n = len(keys)
        if pos < 0:
            pos += n
        if not 0 <= pos < n:
            raise KeyNotFound(pos, keys)
        return keys[pos]

    def __repr__(self) -> str:
        return f"OrderedKeys({self.keys()!r})"
