"""Built-in Aggregators for Every (SURVEY.md §2.2 aggregator row).

Each compiles to a native aggregate Column inside ``df.groupBy().agg(...)``;
Catalyst always performs map-side partial aggregation
(``HashAggregate(partial)`` -> exchange -> ``HashAggregate(final)``), which is
the reference's ``AggregateBy`` optimization applied universally
(SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import Aggregator


class _Unary(Aggregator):
    def __init__(self, declared) -> None:
        super().__init__(declared)
        if len(self.declared_names) != 1:
            raise ValueError(f"{type(self).__name__} declares exactly one field")

    @property
    def name(self) -> str:
        return self.declared_names[0]


class Sum(_Unary):
    def __init__(self, declared, cast: str | None = None) -> None:
        super().__init__(declared)
        self.cast = cast

    def agg_column(self, arg_cols):
        (arg,) = arg_cols
        c = F.sum(arg)
        if self.cast:
            c = c.cast(self.cast)
        return c.alias(self.name)


class Count(_Unary):
    """Count rows in the group. With an argument field, counts non-nulls when
    ``skip_nulls`` (Cascading Count counts all tuples; count(col) semantics
    available via flag)."""

    def __init__(self, declared, skip_nulls: bool = False) -> None:
        super().__init__(declared)
        self.skip_nulls = skip_nulls

    def agg_column(self, arg_cols):
        if self.skip_nulls and arg_cols:
            return F.count(arg_cols[0]).alias(self.name)
        return F.count(F.lit(1)).alias(self.name)


class CountDistinct(_Unary):
    def agg_column(self, arg_cols):
        return F.countDistinct(*arg_cols).alias(self.name)


class Average(_Unary):
    def agg_column(self, arg_cols):
        (arg,) = arg_cols
        return F.avg(arg).alias(self.name)


class Min(_Unary):
    """Numeric min (Cascading ``Min`` coerces to number — reference-
    faithful double semantics, so 64-bit integers beyond 2^53 lose
    precision and unparseable strings null out, exactly as in Cascading;
    use ``MinValue``/``MaxValue`` for type-preserving extrema)."""

    def agg_column(self, arg_cols):
        (arg,) = arg_cols
        return F.min(arg.cast("double")).alias(self.name)


class Max(_Unary):
    def agg_column(self, arg_cols):
        (arg,) = arg_cols
        return F.max(arg.cast("double")).alias(self.name)


class MinValue(_Unary):
    """Min by natural comparator, any Comparable type (Cascading MinValue)."""

    def agg_column(self, arg_cols):
        (arg,) = arg_cols
        return F.min(arg).alias(self.name)


class MaxValue(_Unary):
    def agg_column(self, arg_cols):
        (arg,) = arg_cols
        return F.max(arg).alias(self.name)


class First(_Unary):
    """First value in group iteration order.

    Deterministic only after a sorted GroupBy; the planner routes sorted
    groups through ``min_by``/window so the reference's sorted-group
    semantics (``GroupByReducer.java:102-131``) hold.  Unsorted: Spark's
    ``first`` (arbitrary but stable per plan).
    """

    def agg_column(self, arg_cols):
        (arg,) = arg_cols
        return F.first(arg, ignorenulls=False).alias(self.name)

    def sorted_agg_column(self, arg_cols, sort_cols, descending=False):
        (arg,) = arg_cols
        key = F.struct(*sort_cols)
        fn = F.max_by if descending else F.min_by
        return fn(arg, key).alias(self.name)


class Last(_Unary):
    def agg_column(self, arg_cols):
        (arg,) = arg_cols
        return F.last(arg, ignorenulls=False).alias(self.name)

    def sorted_agg_column(self, arg_cols, sort_cols, descending=False):
        (arg,) = arg_cols
        key = F.struct(*sort_cols)
        fn = F.min_by if descending else F.max_by
        return fn(arg, key).alias(self.name)


class Collect(_Unary):
    """Collect group values into an array (sorted groups: by sort key)."""

    def agg_column(self, arg_cols):
        (arg,) = arg_cols
        return F.collect_list(arg).alias(self.name)

    def sorted_agg_column(self, arg_cols, sort_cols, descending=False):
        (arg,) = arg_cols
        paired = F.collect_list(F.struct(*sort_cols, arg.alias("__v")))
        arr = F.array_sort(paired)
        if descending:
            arr = F.reverse(arr)
        return F.transform(arr, lambda s: s["__v"]).alias(self.name)
