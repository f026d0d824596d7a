"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.4: no watermarks, no event-time
windows, no stateful operators — Flink DataSet API).  This package goes
beyond parity: the same pipe DSL compiles onto streaming DataFrames —
DataFrame transformations are identical in Structured Streaming, so the
planner needs no changes; what streaming adds is sources/sinks, watermarks,
event-time windows, and custom stateful operators
(``applyInPandasWithState``).
"""

from .taps import FileStreamTap, RateStreamTap, MemorySink
from .flow import StreamingFlowConnector, StreamingFlow
from .ops import (
    with_watermark, tumbling_window_agg, sliding_window_agg,
    session_window_agg, stateful_sessionize, stream_chunk_packer,
    stream_curate, stream_pack_bins,
    stream_decontaminate, stream_domain_quota, stream_dsir_gate,
    stream_embedding_gate,
    stream_exact_dedup, stream_media_dedup,
    stream_drift_monitor,
    stream_ks_monitor,
    stream_label_agreement,
    stream_psi_monitor,
    stream_score_monitor,
    stream_w1_monitor,
    stream_rolling_stats, stream_session_funnel,
    stream_session_transitions, stream_stream_join,
    stream_token_quota,
)

__all__ = [n for n in dir() if not n.startswith("_")]
