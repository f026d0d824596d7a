"""Built-in Functions (SURVEY.md §2.2 table): regex, date, expression, etc.

Each compiles to native Column expressions — the Spark analog of the
reference hosting cascading-core operations inside fused Flink operators
(``runtime/each/EachMapper.java:41-139``); here fusion is whole-stage
codegen, which we keep by never leaving the JVM for built-ins.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import functions as F

from ..fields import Fields
from .base import Function


class Identity(Function):
    """Pass arguments through, optionally renaming/coercing.

    Cascading ``Identity`` (used by Retain/Rename sub-assemblies).
    """

    def __init__(self, declared: Sequence[str] | None = None,
                 types: Sequence | None = None) -> None:
        super().__init__(Fields.coerce(declared) if declared is not None else Fields.ARGS)
        self.types = list(types) if types is not None else None

    def columns(self, arg_cols):
        if self.declared is Fields.ARGS:
            cols = list(arg_cols)
        else:
            n = len(self.declared_names)
            if n and n != len(arg_cols):
                # Cascading's Identity raises on arity mismatch; silently
                # truncating would turn a selector typo into data loss.
                # Zero declared fields stay legal — the Discard idiom
                # (SWAP with empty results) drops the argument columns.
                raise ValueError(
                    f"Identity: declared arity {n} != argument arity "
                    f"{len(arg_cols)}")
            cols = list(arg_cols)[:n] if n == 0 else list(arg_cols)
        if self.types is not None:
            cols = [c.cast(t) for c, t in zip(cols, self.types)]
        return cols


class Coerce(Function):
    """Cast argument fields to the given Spark SQL types (Cascading Coerce)."""

    def __init__(self, types: Sequence) -> None:
        super().__init__(Fields.ARGS)
        self.types = list(types)

    def columns(self, arg_cols):
        return [c.cast(t) for c, t in zip(arg_cols, self.types)]

    def safe_columns(self, arg_cols):
        # try_cast: malformed values become NULL instead of failing the job
        # (ANSI cast throws); the planner traps null-for-non-null rows
        return [c.try_cast(t) for c, t in zip(arg_cols, self.types)]


class Insert(Function):
    """Insert literal values as new fields (Cascading ``Insert``)."""

    def __init__(self, declared, *values) -> None:
        super().__init__(declared)
        if len(values) != len(self.declared_names):
            raise ValueError("Insert: values arity != declared arity")
        self.values = values

    def columns(self, arg_cols):
        return [F.lit(v) for v in self.values]


class RegexParser(Function):
    """Extract regex groups into declared fields (Cascading ``RegexParser``).

    ``groups`` are 1-based regex group indices, one per declared field
    (group 0 = whole match).
    """

    def __init__(self, declared, pattern: str, groups: Sequence[int] | None = None) -> None:
        super().__init__(declared)
        self.pattern = pattern
        self.groups = list(groups) if groups is not None else list(
            range(1, len(self.declared_names) + 1))

    def columns(self, arg_cols):
        (arg,) = arg_cols
        return [F.regexp_extract(arg, self.pattern, g) for g in self.groups]


class RegexSplitter(Function):
    """Split one field into N declared fields on a regex delimiter."""

    def __init__(self, declared, pattern: str) -> None:
        super().__init__(declared)
        self.pattern = pattern

    def columns(self, arg_cols):
        (arg,) = arg_cols
        parts = F.split(arg, self.pattern)
        return [parts.getItem(i) for i in range(len(self.declared_names))]


class RegexSplitGenerator(Function):
    """Split one field on a regex, emitting ONE ROW PER TOKEN.

    The reference's WordCount uses this
    (``/root/reference/example/WordCount.java:43-46``); here it compiles to
    ``explode(split(...))`` — a native generator, no UDF.  Empty tokens are
    dropped (matching Cascading's behavior of not emitting empty matches for
    typical ``\\s+`` delimiters on trimmed input).
    """

    is_generator = True

    def __init__(self, declared, pattern: str, drop_empty: bool = True) -> None:
        super().__init__(declared)
        if len(self.declared_names) != 1:
            raise ValueError("RegexSplitGenerator declares exactly one field")
        self.pattern = pattern
        self.drop_empty = drop_empty

    def generate(self, arg_cols):
        (arg,) = arg_cols
        arr = F.split(arg, self.pattern)
        if self.drop_empty:
            arr = F.filter(arr, lambda x: x != F.lit(""))
        return arr


class RegexReplace(Function):
    """Regex find/replace on one field (Cascading ``RegexReplace``)."""

    def __init__(self, declared, pattern: str, replacement: str,
                 replace_all: bool = True) -> None:
        super().__init__(declared)
        self.pattern = pattern
        self.replacement = replacement
        self.replace_all = replace_all

    def columns(self, arg_cols):
        (arg,) = arg_cols
        if self.replace_all:
            return [F.regexp_replace(arg, self.pattern, self.replacement)]
        # replace-first: lazy-prefix anchor, with the user's pattern
        # wrapped in its own group.  The two injected groups (prefix,
        # whole-match) shift the user's group numbering by 2, so unescaped
        # $N in the replacement and \N backrefs in the pattern renumber
        # (+2; $0 maps to the wrapped whole match = group 2); '(?s)' keeps
        # '.' matching newlines so a first occurrence after a newline is
        # still found.
        import re as _re

        def _shift(m):
            return m.group(1) + str(int(m.group(2)) + 2)

        repl = _re.sub(r"(?<!\\)(\$)(\d+)", _shift, self.replacement)
        pat = _re.sub(r"(\\)(\d+)", _shift, self.pattern)
        return [F.regexp_replace(arg, "(?s)^(.*?)(" + pat + ")",
                                 "$1" + repl)]


class DateParser(Function):
    """Parse a string field to a timestamp (Cascading ``DateParser``).

    Cascading emits epoch millis (long); we declare TimestampType as the
    idiomatic Spark representation, with ``as_long=True`` for parity mode.
    """

    def __init__(self, declared, fmt: str, as_long: bool = False) -> None:
        super().__init__(declared)
        self.fmt = fmt
        self.as_long = as_long

    def columns(self, arg_cols):
        (arg,) = arg_cols
        ts = F.to_timestamp(arg, self.fmt)
        if self.as_long:
            # full epoch millis like Cascading's Date.getTime() —
            # unix_timestamp() truncates to seconds; floor(double*1000)
            # loses 1 ms when the IEEE double for fractional seconds lands
            # just below the integer; unix_millis is the exact integer path
            ts = F.unix_millis(ts)
        return [ts]

    def safe_columns(self, arg_cols):
        (arg,) = arg_cols
        ts = F.try_to_timestamp(arg, F.lit(self.fmt))
        return [F.unix_millis(ts) if self.as_long else ts]


class DateFormatter(Function):
    """Format a timestamp field to string (Cascading ``DateFormatter``)."""

    def __init__(self, declared, fmt: str) -> None:
        super().__init__(declared)
        self.fmt = fmt

    def columns(self, arg_cols):
        (arg,) = arg_cols
        return [F.date_format(arg, self.fmt)]


class ExpressionFunction(Function):
    """Evaluate a SQL expression over the argument fields.

    Cascading's ``ExpressionFunction`` runs Janino-compiled Java expressions
    (cascading-expression, reference ``pom.xml:136-140``); the Spark-native
    equivalent is ``F.expr`` — a superset (full Spark SQL scalar surface),
    compiled by Catalyst into codegen'd bytecode.
    """

    def __init__(self, declared, expression: str,
                 trap_null_results: bool = False) -> None:
        super().__init__(declared)
        if len(self.declared_names) != 1:
            raise ValueError("ExpressionFunction declares exactly one field")
        self.expression = expression
        # Opt-in trap mode for expressions written with SQL try_ functions
        # (try_divide, try_cast, try_add, ...): a NULL result for non-null
        # arguments diverts the row to the pipe's trap channel.  Off by
        # default: arbitrary expressions may produce legitimate NULLs,
        # which must not be mistaken for failures.
        self.trap_null_results = trap_null_results

    def columns(self, arg_cols):
        return [F.expr(self.expression)]

    def safe_columns(self, arg_cols):
        return [F.expr(self.expression)] if self.trap_null_results else None


class SetValue(Function):
    """Emit one of two values depending on a filter (Cascading ``SetValue``)."""

    def __init__(self, declared, filter_op, true_value=True, false_value=False) -> None:
        super().__init__(declared)
        self.filter_op = filter_op
        self.true_value = true_value
        self.false_value = false_value

    def columns(self, arg_cols):
        removed = self.filter_op.remove(arg_cols)
        # Filter semantics: remove==True -> filter would drop -> false_value
        return [F.when(~removed, F.lit(self.true_value)).otherwise(F.lit(self.false_value))]


class FieldJoiner(Function):
    """Join all argument fields into one delimited string."""

    def __init__(self, declared, delimiter: str) -> None:
        super().__init__(declared)
        self.delimiter = delimiter

    def columns(self, arg_cols):
        return [F.concat_ws(self.delimiter, *[c.cast("string") for c in arg_cols])]


class FieldFormatter(Function):
    """printf-style formatting of argument fields into one string."""

    def __init__(self, declared, fmt: str) -> None:
        super().__init__(declared)
        self.fmt = fmt

    def columns(self, arg_cols):
        return [F.format_string(self.fmt, *arg_cols)]


class UnGroup(Function):
    """Un-pivot: emit one row per value-field group (Cascading ``UnGroup``).

    ``key_fields`` are repeated on every output row; ``value_selectors`` is a
    list of field-name groups, each emitted as one row under ``declared``.
    Compiles to ``stack`` (native generator).
    """

    is_generator = True

    def __init__(self, declared, key_fields, value_selectors: Sequence[Sequence[str]]) -> None:
        super().__init__(declared)
        self.key_fields = Fields.coerce(key_fields)
        self.value_selectors = [list(vs) for vs in value_selectors]

    def generate(self, arg_cols):
        raise NotImplementedError("UnGroup is planner-expanded (stack)")


class PyFunction(Function):
    """User-supplied Python row function — the UDF slow path.

    ``fn(pandas.DataFrame[args]) -> pandas.DataFrame[declared]`` executed via
    Arrow-batched ``mapInPandas`` (SURVEY.md §2.2 "UDF/UDAF/UDTF surface").
    May return more or fewer rows than input only when used with
    ``output_selector=Fields.RESULTS`` (generator-style).
    """

    is_pandas = True

    def __init__(self, declared, fn: Callable, types: Sequence[str] | None = None) -> None:
        super().__init__(declared)
        self.fn = fn
        self.types = list(types) if types is not None else ["string"] * len(self.declared_names)

    def pandas_map(self, pdf):
        return self.fn(pdf)


# Cascading parity aliases: ScriptFunction/ScriptFilter run arbitrary user
# scripts (Java source in Cascading; Python here — same role in the DSL).
ScriptFunction = PyFunction
