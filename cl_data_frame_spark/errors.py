"""Error surface matching the reference's condition system.

Reference: cl-data-frame.lisp:179-192 defines two conditions —
``duplicate-key`` (raised by ``add-key!``, cl-data-frame.lisp:222-223) and
``key-not-found`` whose report includes the full set of valid keys
(cl-data-frame.lisp:185-192,205-211). Construction-time assertions
(equal column lengths cl-data-frame.lisp:438-445, non-empty frame
cl-data-frame.lisp:317) get their own classes here.

These raise *eagerly* (at wrapper call time) even though Spark execution is
lazy, matching the reference's error timing (SURVEY.md §7.4.4).
"""

from __future__ import annotations


class DataFrameError(Exception):
    """Base class for all engine errors."""


class DuplicateKey(DataFrameError):
    """A key is already present in the frame (cl-data-frame.lisp:179-183)."""

    def __init__(self, key: str):
        self.key = key
        super().__init__(f"Duplicate key {key!r}.")


class KeyNotFound(DataFrameError, KeyError):
    """Key lookup failed; message lists valid keys (cl-data-frame.lisp:185-192)."""

    def __init__(self, key, valid_keys):
        self.key = key
        self.valid_keys = list(valid_keys)
        DataFrameError.__init__(
            self, f"Key {key!r} not found, valid keys are {self.valid_keys}."
        )


class ColumnLengthMismatch(DataFrameError):
    """Columns don't have the same length (cl-data-frame.lisp:438-445,460-461)."""

    def __init__(self, expected: int, got: int, key=None):
        self.expected = expected
        self.got = got
        self.key = key
        where = f" for column {key!r}" if key is not None else ""
        super().__init__(
            f"Column length {got}{where} does not match data frame length {expected}."
        )


class EmptyFrame(DataFrameError):
    """Can't create an empty data frame (cl-data-frame.lisp:317)."""

    def __init__(self):
        super().__init__("Can't create an empty data frame.")


class BoundedSeriesExceeded(DataFrameError):
    """A per-key ordered-series fold would collect too many points.

    ``holt_linear`` / ``cusum_drift`` aggregate each key's FULL ordered
    value array into one executor buffer (the bounded-series-per-key
    contract); a hot key with 10⁸ points would OOM that executor at
    100 TB. The cheap ``max(count) per key`` pre-scan raises this
    instead, naming the streaming-friendly alternative.
    """

    def __init__(self, op: str, worst: int, limit: int,
                 alternative: str):
        self.op = op
        self.worst = worst
        self.limit = limit
        super().__init__(
            f"{op}: a key holds {worst:,} points, over the "
            f"{limit:,}-point bounded-series-per-key contract — one "
            f"executor would buffer the whole series. Pre-aggregate "
            f"to a coarser grain, use {alternative} (windowed, "
            f"unbounded-safe), or pass assume_bounded=True if the "
            f"key cardinality is known safe.")


class CollectGuardExceeded(DataFrameError):
    """A driver-side materialization would exceed the collect guard.

    The Tier-R contract surface (``column``/``columns``/positional
    ``slice``/``as_dict``/``to_pandas``/``collect``) intentionally
    materializes on the driver to honor the reference's in-memory
    semantics (cl-data-frame.lisp:345-361) — at 100 TB that habit
    would OOM the driver, so collects above
    ``cl_data_frame_spark.frame.MAX_COLLECT_ROWS`` raise instead.
    """

    def __init__(self, nrow: int, limit: int):
        self.nrow = nrow
        self.limit = limit
        super().__init__(
            f"Driver-side materialization of {nrow:,} rows exceeds the "
            f"collect guard ({limit:,} rows). Use the lazy surface "
            "(col()/select()/filter()/operators.*) for distributed "
            "work, write results with sources.write_parquet, or raise "
            "cl_data_frame_spark.frame.MAX_COLLECT_ROWS deliberately.")
