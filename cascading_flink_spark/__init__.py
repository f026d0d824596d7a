"""cascading_flink_spark — a PySpark-native dataflow engine with the
capability surface of dataArtisans/cascading-flink (Cascading on Flink).

A Cascading-equivalent flow DSL (Fields algebra + pipes + taps + operations)
that compiles to DataFrame logical plans, letting Catalyst/Tungsten/AQE do
the physical work the reference hand-implements.  See SURVEY.md for the
capability inventory this package reproduces.
"""

from .fields import Fields, FieldsResolutionError
from .pipes import (
    Pipe, Each, Every, GroupBy, CoGroup, HashJoin, Merge, Checkpoint,
    Intersect, Except, Rollup, Cube, Pivot, Transform,
    Joiner, InnerJoin, LeftJoin, RightJoin, OuterJoin, MixedJoin, BufferJoin,
    SemiJoin, AntiJoin,
    Retain, Discard, Rename, Coerce, Unique,
    CountBy, SumBy, AverageBy, MinBy, MaxBy, FirstBy,
)
from .taps import (
    Tap, Hfs, GlobHfs, MultiSourceTap, PartitionTap, DataFrameTap, MemoryTap,
    BucketedTap, SnapshotTap, Scheme, TextLine, TextDelimited,
    UnknownTextDelimited, OrcScheme, ParquetScheme, JsonScheme,
    XmlScheme, SinkMode,
    WritableSequenceFile, pos,
)
from .flow import Cascade, Flow, FlowConnector, FlowDef, FlowStepJob
from .planner import FlowPlanner, PlannerError
from .session import get_spark
from . import operations

__version__ = "0.1.0"
__all__ = [n for n in dir() if not n.startswith("_")]
