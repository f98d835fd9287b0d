"""Sawtooth window semantics: rounding, hop resolutions, brute-force oracle.

Window membership rule (the single source of truth for the whole engine,
mirroring the reference's NaiveAggregator oracle,
aggregator/src/test/scala/ai/chronon/aggregator/test/NaiveAggregator.scala:38-44):

    round(query_ts - window, tail_hop) <= event_ts < round(query_ts, head_rounding)

with head_rounding = 1 ms for TEMPORAL accuracy (strict ``event.ts < query.ts``)
and tail hop chosen by window length (FiveMinuteResolution,
aggregator/.../windowing/Resolution.scala:37-47): >=12d -> 1d, >=12h -> 1h,
else 5min.  Unbounded windows have no tail bound.
"""

from __future__ import annotations

import numpy as np

from ..api import MILLIS_5MIN, MILLIS_DAY, MILLIS_HOUR, AggregationPart, Window
from .scalar_ops import make_scalar_op


def round_down(ts, hop):
    """TsUtils.round: floor to hop multiple (reference TsUtils.scala:39-40)."""
    return (ts // hop) * hop


class FiveMinuteResolution:
    hop_sizes = (MILLIS_DAY, MILLIS_HOUR, MILLIS_5MIN)

    @staticmethod
    def tail_hop(window: Window) -> int:
        ms = window.millis
        if ms >= 12 * MILLIS_DAY:
            return MILLIS_DAY
        if ms >= 12 * MILLIS_HOUR:
            return MILLIS_HOUR
        return MILLIS_5MIN


class DailyResolution:
    hop_sizes = (MILLIS_DAY,)

    @staticmethod
    def tail_hop(window: Window) -> int:
        if window.millis % MILLIS_DAY != 0:
            raise ValueError(f"daily resolution requires day-multiple windows, got {window}")
        return MILLIS_DAY


def window_bounds(query_ts: np.ndarray, part: AggregationPart, resolution, head_rounding: int = 1):
    """(lower_inclusive, upper_exclusive) effective ts bounds per query."""
    q = np.asarray(query_ts, dtype=np.int64)
    upper = q if head_rounding == 1 else round_down(q, head_rounding)
    if part.window.unbounded:
        lower = np.full_like(q, np.iinfo(np.int64).min // 4)
    else:
        hop = resolution.tail_hop(part.window)
        lower = round_down(q - part.window.millis, hop)
    return lower, upper


class NaiveOracle:
    """Brute-force per-query recompute with the exact membership rule —
    the test golden model (mirrors NaiveAggregator.scala:24-48)."""

    def __init__(self, parts: list[AggregationPart], resolution=FiveMinuteResolution, head_rounding: int = 1):
        self.parts = parts
        self.resolution = resolution
        self.head_rounding = head_rounding

    def aggregate(self, events, query_ts_list):
        """events: list of dict rows (must contain 'ts'); returns
        list (per query) of dict {output_column: finalized_value}."""
        out = []
        for q in query_ts_list:
            row_out = {}
            for part in self.parts:
                op = make_scalar_op(part)
                lo, hi = window_bounds(np.array([q]), part, self.resolution, self.head_rounding)
                lo, hi = int(lo[0]), int(hi[0])
                ir = None
                for ev in events:
                    ts = ev["ts"]
                    if not (lo <= ts < hi):
                        continue
                    v = ev.get(part.input_column)
                    if v is None or (isinstance(v, float) and np.isnan(v)):
                        continue
                    if part.bucket is not None:
                        b = ev.get(part.bucket)
                        if b is None:
                            continue
                        ir = ir or {}
                        sub = ir.get(b)
                        ir[b] = op.prepare(v, ts) if sub is None else op.update(sub, v, ts)
                    else:
                        ir = op.prepare(v, ts) if ir is None else op.update(ir, v, ts)
                if part.bucket is not None:
                    row_out[part.output_column] = (
                        None if ir is None else {b: op.finalize(s) for b, s in ir.items()}
                    )
                else:
                    row_out[part.output_column] = None if ir is None else op.finalize(ir)
            out.append(row_out)
        return out
