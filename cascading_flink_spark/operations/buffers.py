"""Buffers — full-group operations over sorted group iterators.

The reference streams Flink's sorted group iterator into Cascading Buffers
(``runtime/groupBy/GroupByReducer.java:102-131``).  Spark-side:

* :class:`FirstNBuffer` (top-N per group) compiles to a Window +
  ``row_number() <= n`` — fully native, no Python (SURVEY.md §2.2).
* :class:`PyBuffer` (arbitrary user logic) compiles to
  ``groupBy(keys).applyInPandas`` with the group sorted by the GroupBy's
  sort fields before the user function sees it.  Bounded-memory caveat: one
  group must fit in one Arrow batch — same practical limit the reference
  works around with spilling (``SpillingTupleCollectionFactory.java:41-49``);
  at 100 TB scale prefer salting or pre-aggregation for giant groups.
"""

from __future__ import annotations

from typing import Callable, Sequence

from .base import Buffer


class FirstNBuffer(Buffer):
    """Emit the first N rows of each (sorted) group — planner-expanded to a
    Window ``row_number() <= n``; no Python executes."""

    is_pandas = False

    def __init__(self, n: int) -> None:
        super().__init__(None)
        self.n = n


class PyBuffer(Buffer):
    """User Python buffer: ``fn(pandas.DataFrame) -> pandas.DataFrame``.

    The input frame contains the full group including key columns, sorted by
    the GroupBy sort fields; the output frame must have the declared schema
    (``declared`` names + ``types`` Spark SQL type strings). Group keys are
    NOT auto-prepended — declare them if wanted (matches Cascading Buffer's
    control over its output tuple).
    """

    def __init__(self, declared, fn: Callable, types: Sequence[str]) -> None:
        super().__init__(declared)
        self.fn = fn
        self.types = list(types)
        if len(self.types) != len(self.declared_names):
            raise ValueError("PyBuffer: types arity != declared arity")

    def pandas_buffer(self, pdf):
        return self.fn(pdf)
