"""Built-in Filters (SURVEY.md §2.2): regex/expression/null/logic/sample/limit.

Cascading convention: ``Filter.isRemove(row) == True`` drops the row.  Every
built-in compiles :meth:`remove` to a native boolean Column so the planner
emits ``df.filter(~remove)`` — pushdown-eligible.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import functions as F

from .base import Filter


class RegexFilter(Filter):
    """Keep rows whose (first) argument matches the pattern.

    ``remove_match=True`` inverts (Cascading's removeMatch flag).
    Uses unanchored find semantics like java.util.regex ``find()``.
    """

    def __init__(self, pattern: str, remove_match: bool = False) -> None:
        super().__init__()
        self.pattern = pattern
        self.remove_match = remove_match

    def remove(self, arg_cols):
        (arg,) = arg_cols
        # a NULL argument MATCHES NOTHING (java.util.regex semantics):
        # remove_match keeps it, keep-match removes it.  The raw rlike is
        # NULL for NULL args, and filter(~NULL) would silently drop the
        # row in BOTH modes.
        found = F.coalesce(arg.rlike(self.pattern), F.lit(False))
        return found if self.remove_match else ~found


class ExpressionFilter(Filter):
    """SQL boolean expression; True => REMOVE (Cascading semantics).

    ``trap_null_results=True`` opts the filter into native trap mode for
    expressions written with SQL try_ functions: under a bound trap, rows
    where the predicate evaluates NULL for non-null arguments divert to
    the trap channel (a legitimate three-valued-logic NULL would divert
    too — hence opt-in)."""

    def __init__(self, expression: str,
                 trap_null_results: bool = False) -> None:
        super().__init__()
        self.expression = expression
        self.trap_null_results = trap_null_results

    def remove(self, arg_cols):
        return F.expr(self.expression)

    def safe_remove(self, arg_cols):
        return F.expr(self.expression) if self.trap_null_results else None


class FilterNull(Filter):
    """Remove rows where ANY argument field is null."""

    def remove(self, arg_cols):
        cond = F.lit(False)
        for c in arg_cols:
            cond = cond | c.isNull()
        return cond


class FilterNotNull(Filter):
    """Remove rows where ANY argument field is NOT null."""

    def remove(self, arg_cols):
        cond = F.lit(False)
        for c in arg_cols:
            cond = cond | c.isNotNull()
        return cond


class Sample(Filter):
    """Bernoulli sample: keep ~fraction of rows, seeded (Cascading Sample).

    Compiles to a deterministic hash test rather than ``rand()`` so results
    are stable across retries/partitionings — important for the oracle gate.
    """

    def __init__(self, fraction: float, seed: int = 42) -> None:
        super().__init__()
        self.fraction = fraction
        self.seed = seed

    def remove(self, arg_cols):
        h = F.abs(F.xxhash64(*arg_cols, F.lit(self.seed)))
        return (h % 1_000_000) >= int(self.fraction * 1_000_000)


class Md5Sample(Filter):
    """Deterministic sample reproducible across engines: keep rows whose
    md5(key)'s first hex digit falls below a cutoff (fraction in 16ths).
    Slower than :class:`Sample` (md5 vs xxhash64) but any SQL engine
    reproduces it — used where a DuckDB oracle must re-derive the sample."""

    def __init__(self, sixteenths: int = 2) -> None:
        super().__init__()
        if not 0 < sixteenths <= 16:
            raise ValueError("sixteenths in 1..16")
        self.sixteenths = sixteenths

    def remove(self, arg_cols):
        key = F.concat_ws("-", *[c.cast("string") for c in arg_cols])
        digit = F.substring(F.md5(key), 1, 1)
        keep_digits = "0123456789abcdef"[: self.sixteenths]
        return ~digit.isin(*list(keep_digits))


class Limit(Filter):
    """Keep first n rows (Cascading Limit). Planner-special-cased to df.limit."""

    def __init__(self, n: int) -> None:
        super().__init__()
        self.n = n

    def remove(self, arg_cols):  # pragma: no cover - planner intercepts
        raise NotImplementedError("Limit is planner-expanded to df.limit(n)")


class NoOp(Filter):
    """Keep everything (Cascading NoOp / Status)."""

    def remove(self, arg_cols):
        return F.lit(False)


#: Cascading ``Status`` — progress marker; identity here (counters cover it).
Status = NoOp


class RegexMatcher(Filter):
    """Match the WHOLE concatenated tuple against a pattern (Cascading
    ``RegexMatcher`` matches the tuple rendered with tab delimiters);
    anchored match, unlike RegexFilter's find semantics."""

    def __init__(self, pattern: str, remove_match: bool = False,
                 delimiter: str = "\t") -> None:
        super().__init__()
        self.pattern = pattern
        self.remove_match = remove_match
        self.delimiter = delimiter

    def remove(self, arg_cols):
        joined = F.concat_ws(self.delimiter, *[c.cast("string") for c in arg_cols])
        matched = joined.rlike(f"^(?:{self.pattern})$")
        return matched if self.remove_match else ~matched


class Debug(Filter):
    """Identity filter; a debug tap point. Plan-time toggled via DebugLevel
    (reference strips Debug at plan time, ``FlinkConnector.java:127``)."""

    def __init__(self, prefix: str = "") -> None:
        super().__init__()
        self.prefix = prefix

    def remove(self, arg_cols):
        return F.lit(False)


class And(Filter):
    """Remove when ALL child filters would remove (Cascading logic.And)."""

    def __init__(self, *filters: Filter) -> None:
        super().__init__()
        self.filters = filters

    def remove(self, arg_cols):
        cond = F.lit(True)
        for f in self.filters:
            cond = cond & f.remove(arg_cols)
        return cond


class Or(Filter):
    def __init__(self, *filters: Filter) -> None:
        super().__init__()
        self.filters = filters

    def remove(self, arg_cols):
        cond = F.lit(False)
        for f in self.filters:
            cond = cond | f.remove(arg_cols)
        return cond


class Not(Filter):
    def __init__(self, filter_: Filter) -> None:
        super().__init__()
        self.filter_ = filter_

    def remove(self, arg_cols):
        return ~self.filter_.remove(arg_cols)


class Xor(Filter):
    def __init__(self, a: Filter, b: Filter) -> None:
        super().__init__()
        self.a, self.b = a, b

    def remove(self, arg_cols):
        ra, rb = self.a.remove(arg_cols), self.b.remove(arg_cols)
        return (ra | rb) & ~(ra & rb)


class CounterOp(Filter):
    """Per-row counter (Cascading ``Counter`` operation / FlowStats).

    The reference pipes counters through Flink accumulators polled every 10s
    (``runtime/stats/AccumulatorCache.java:28``, ``FlinkFlowProcess.increment``).
    Spark-side this compiles to ``df.observe(name, count(...))`` — a native
    Observation metric collected with the action, zero runtime cost, no UDF.
    Read results via ``flow.stats()`` after ``complete()``."""

    def __init__(self, group: str, counter: str) -> None:
        super().__init__()
        self.group = group
        self.counter = counter

    @property
    def metric_name(self) -> str:
        return f"{self.group}.{self.counter}"

    def remove(self, arg_cols):
        return F.lit(False)


class PyFilter(Filter):
    """User Python predicate: fn(pandas.DataFrame[args]) -> bool Series (keep)."""

    is_pandas = True

    def __init__(self, fn: Callable) -> None:
        super().__init__()
        self.fn = fn


# Cascading parity alias (arbitrary user-script predicate).
ScriptFilter = PyFilter
