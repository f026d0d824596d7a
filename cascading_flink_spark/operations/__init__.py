"""Operation surface hosted inside Each/Every pipes (SURVEY.md §2.2).

Every built-in compiles to native ``pyspark.sql.functions`` Column
expressions so Catalyst can optimize through them (predicate pushdown,
whole-stage codegen).  Only user-supplied Python logic (``PyFunction``,
``PyFilter``, ``PyBuffer``) drops to Arrow-batched pandas execution.
"""

from .base import Operation, Function, Filter, Aggregator, Buffer
from .functions import (
    Identity, Insert, Coerce as CoerceFn, RegexParser, RegexSplitter,
    RegexSplitGenerator, RegexReplace, DateParser, DateFormatter,
    ExpressionFunction, SetValue, FieldJoiner, FieldFormatter, UnGroup,
    PyFunction, ScriptFunction,
)
from .filters import (
    RegexFilter, ExpressionFilter, FilterNull, FilterNotNull, Sample, Limit,
    Md5Sample, NoOp, Status, RegexMatcher, Debug, And, Or, Not, Xor, PyFilter,
    CounterOp, ScriptFilter,
)
from .aggregators import (
    Sum, Count, Average, Min, Max, First, Last, MaxValue, MinValue,
    CountDistinct, Collect,
)
from .buffers import FirstNBuffer, PyBuffer
from .assertions import (
    AssertionLevel, AssertNotNull, AssertNull, AssertSizeEquals,
    AssertSizeLessThan, AssertSizeMoreThan, AssertMatches, AssertExpression,
    AssertionFailed,
)

__all__ = [n for n in dir() if not n.startswith("_")]
