"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.9) — the only watermark-like
concept is the pairing tolerance window.  The engine still exposes the
streaming form of its sessionization/windowed operators so the same
semantics run over a stream: native ``F.session_window`` + watermark.
"""

from esa_pfa_spark.streaming.sessions import (  # noqa: F401
    session_window_agg,
    stream_session_counts,
)
from esa_pfa_spark.streaming.stateful import stream_ffill  # noqa: F401
