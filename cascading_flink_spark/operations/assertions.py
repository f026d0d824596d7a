"""Plan-time-toggleable assertions (Cascading AssertionLevel surface).

The reference registers assertion-level applying rules at plan time
(``FlinkConnector.java:126``) — assertions are stripped when the flow's
assertion level is below theirs.  Here each assertion compiles to a native
boolean Column; at runtime a failing row raises via an ``assert_true``
expression (JVM-side, no Python).
"""

from __future__ import annotations

import enum

from pyspark.sql import functions as F

from .base import Filter


class AssertionLevel(enum.IntEnum):
    NONE = 0
    VALID = 1
    STRICT = 2


class AssertionFailed(Exception):
    pass


class _Assertion(Filter):
    level = AssertionLevel.STRICT

    def condition(self, arg_cols):
        """Column[bool]: True == assertion holds."""
        raise NotImplementedError

    def remove(self, arg_cols):
        # Planner wires assertions through filter(assert_true(cond) is null)
        # which raises on violation and keeps all rows otherwise.
        return F.lit(False)


class AssertNotNull(_Assertion):
    def condition(self, arg_cols):
        cond = F.lit(True)
        for c in arg_cols:
            cond = cond & c.isNotNull()
        return cond


class AssertNull(_Assertion):
    def condition(self, arg_cols):
        cond = F.lit(True)
        for c in arg_cols:
            cond = cond & c.isNull()
        return cond


class AssertSizeEquals(_Assertion):
    """Tuple arity check — static in a DataFrame world, verified at plan time."""

    def __init__(self, size: int) -> None:
        super().__init__()
        self.size = size

    def condition(self, arg_cols):
        return F.lit(len(arg_cols) == self.size)


class AssertSizeLessThan(_Assertion):
    def __init__(self, size: int) -> None:
        super().__init__()
        self.size = size

    def condition(self, arg_cols):
        return F.lit(len(arg_cols) < self.size)


class AssertSizeMoreThan(_Assertion):
    def __init__(self, size: int) -> None:
        super().__init__()
        self.size = size

    def condition(self, arg_cols):
        return F.lit(len(arg_cols) > self.size)


class AssertMatches(_Assertion):
    def __init__(self, pattern: str) -> None:
        super().__init__()
        self.pattern = pattern

    def condition(self, arg_cols):
        (arg,) = arg_cols
        return arg.rlike(self.pattern)


class AssertExpression(_Assertion):
    def __init__(self, expression: str) -> None:
        super().__init__()
        self.expression = expression

    def condition(self, arg_cols):
        return F.expr(self.expression)
