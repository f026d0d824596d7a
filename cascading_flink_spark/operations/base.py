"""Base classes for operations hosted inside Each/Every.

Maps the Cascading operation taxonomy (reference embeds these unchanged via
its duct interpreter, ``runtime/each/EachStreamGraph.java:35-98``,
``runtime/groupBy/GroupByReducer.java:42-156``) onto compilation hooks:

* :class:`Function`   — row -> 0..n rows.  Built-ins implement
  :meth:`Function.columns` (native Column per declared field); generator
  functions additionally set ``is_generator`` and implement
  :meth:`Function.generate` returning an array Column that the planner
  explodes.  Python fallback implements :meth:`Function.pandas_map`.
* :class:`Filter`     — boolean per row; :meth:`Filter.remove` returns a
  Column that is True when the row must be REMOVED (Cascading's
  ``Filter.isRemove`` convention).
* :class:`Aggregator` — per-group aggregate; :meth:`Aggregator.agg_column`
  returns an aggregate Column (Catalyst does map-side partial agg for free,
  SURVEY.md §4.1 "partial aggregation").
* :class:`Buffer`     — full-group iterator with sorted input; compiled to
  ``applyInPandas`` (or a Window for built-ins like FirstNBuffer).
"""

from __future__ import annotations

from typing import Sequence

from ..fields import Fields


class Operation:
    """Common: every operation declares its result fields."""

    def __init__(self, declared: Fields | Sequence[str] | str | None) -> None:
        self.declared = Fields.coerce(declared)

    @property
    def declared_names(self) -> list[str]:
        return list(self.declared.names)


class Function(Operation):
    is_generator: bool = False
    is_pandas: bool = False

    def columns(self, arg_cols: list) -> list:
        """Return one Column per declared field (non-generator built-ins)."""
        raise NotImplementedError

    def safe_columns(self, arg_cols: list) -> list | None:
        """try_-compiled variant for trap mode, or None if the operation has
        no row-safe form.  Contract: a NULL result for NON-NULL arguments
        means "this row would have thrown" (try_cast/try_to_timestamp/
        try_divide semantics) — the planner diverts exactly those rows to
        the pipe's trap channel (Cascading traps catch operation failures
        row-wise, reference runtime/util/FlinkFlowProcess.java:169-190)."""
        return None

    def generate(self, arg_cols: list):
        """Return an array Column to explode (generator built-ins).

        If ``len(declared) == 1`` the array elements are scalars; otherwise
        elements are structs with the declared field names."""
        raise NotImplementedError

    def pandas_map(self, pdf):  # pragma: no cover - overridden
        """pandas.DataFrame(args) -> pandas.DataFrame(declared) for PyFunction."""
        raise NotImplementedError


class Filter(Operation):
    is_pandas: bool = False

    def __init__(self) -> None:
        super().__init__(Fields.NONE)

    def remove(self, arg_cols: list):
        """Column[bool]: True => drop the row (Cascading isRemove)."""
        raise NotImplementedError

    def safe_remove(self, arg_cols: list):
        """try_-compiled predicate for trap mode, or None.  Contract: a
        NULL predicate for NON-NULL arguments means "this row would have
        thrown" — the planner diverts those rows to the trap channel (see
        ``Function.safe_columns``)."""
        return None


class Aggregator(Operation):
    def agg_column(self, arg_cols: list):
        """Aggregate Column aliased to the single declared name."""
        raise NotImplementedError


class Buffer(Operation):
    """Full-group operation; receives the whole (optionally sorted) group."""

    is_pandas: bool = True

    def pandas_buffer(self, pdf):
        """pandas.DataFrame(group, sorted) -> pandas.DataFrame(declared)."""
        raise NotImplementedError
