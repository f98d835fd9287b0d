"""Two-stack (banker's queue) exact sliding-window aggregation.

Alternative window engine over *sorted* events + *sorted* queries: O(1)
amortized push/evict/query without requiring a ``delete`` on the op —
re-expresses the reference's TwoStackLiteAggregator
(aggregator/src/main/scala/ai/chronon/aggregator/windowing/
TwoStackLiteAggregator.scala:26-216 and TwoStackLiteAggregationBuffer.scala:
1-84).  The reference deploys it online for low-cardinality tails; here it
doubles as an independent engine to cross-check the sawtooth kernel.

How it works (the classic trick): a FIFO window is two stacks.  The *front*
stack holds older rows with suffix-folded IRs (front[i].ir = fold of rows
i..front_end), so evicting the oldest row is a pop and the fold of the whole
front is just the top suffix IR.  The *back* stack holds newer rows with one
running ``back_ir`` = fold of all back rows.  query = merge(front_suffix,
back_ir).  When the front empties, the back flips over: recompute suffix IRs
right-to-left and swap.  Each row is touched a constant number of times.

Window membership matches the sawtooth rule exactly:
``round(q - window, tail_hop) <= ts < q`` (windowing.py) — the eviction
boundary is monotone in q, which is all the two-stack structure needs.
"""

from __future__ import annotations

import numpy as np

from ..api import AggregationPart
from .scalar_ops import make_scalar_op
from .windowing import FiveMinuteResolution, round_down


class _TwoStackBuffer:
    """One (part, key) sliding buffer (TwoStackLiteAggregationBuffer.scala:1-84)."""

    __slots__ = ("op", "timed", "front_ts", "front_ir", "back_ts", "back_vals",
                 "back_tss", "back_ir")

    def __init__(self, op):
        from collections import deque

        self.op = op
        self.timed = op.timed
        self.front_ts = deque()   # ascending ts, oldest first
        self.front_ir = deque()   # suffix IRs: front_ir[i] folds rows i..end
        self.back_ts: list[int] = []
        self.back_vals: list = []
        self.back_tss: list[int] = []
        self.back_ir = None

    def push(self, v, ts: int):
        self.back_ts.append(ts)
        self.back_vals.append(v)
        self.back_tss.append(ts)
        ir = self.op.prepare(v, ts)
        self.back_ir = ir if self.back_ir is None else self.op.merge(self.back_ir, ir)

    def _flip(self):
        """Move the back onto the front with right-to-left suffix folds."""
        self.front_ts.extend(self.back_ts)
        irs: list = [None] * len(self.back_ts)
        acc = None
        for i in range(len(self.back_ts) - 1, -1, -1):
            leaf = self.op.prepare(self.back_vals[i], self.back_tss[i])
            acc = leaf if acc is None else self.op.merge(leaf, acc)
            irs[i] = acc
        self.front_ir.extend(irs)
        self.back_ts, self.back_vals, self.back_tss, self.back_ir = [], [], [], None

    def evict_older_than(self, lo: int):
        while True:
            while self.front_ts and self.front_ts[0] < lo:
                self.front_ts.popleft()
                self.front_ir.popleft()
            if self.front_ts or not self.back_ts or self.back_ts[0] >= lo:
                return
            self._flip()

    def query(self):
        front = self.front_ir[0] if self.front_ir else None
        if front is None:
            return self.back_ir
        if self.back_ir is None:
            return front
        # clone-free: merge into a fresh IR so stored suffixes stay intact
        leaf = _clone(front, self.op)
        return self.op.merge(leaf, self.back_ir)


def _clone(ir, op):
    import copy

    return copy.deepcopy(ir)


def two_stack_aggregate(
    events_ts: np.ndarray,
    events_vals,
    query_ts: np.ndarray,
    part: AggregationPart,
    resolution=FiveMinuteResolution,
):
    """Aggregate one column for sorted events against sorted queries.

    events_ts / query_ts must be ascending.  Returns one finalized value per
    query (None where the window is empty).  Nulls in events_vals are skipped
    (reference ColumnAggregator null guard)."""
    op = make_scalar_op(part)
    buf = _TwoStackBuffer(op)
    w = None if part.window.unbounded else part.window.millis
    hop = None if w is None else resolution.tail_hop(part.window)
    out = []
    ei, n = 0, len(events_ts)
    for q in np.asarray(query_ts, dtype=np.int64):
        q = int(q)
        while ei < n and int(events_ts[ei]) < q:
            v = events_vals[ei]
            if v is not None and not (isinstance(v, float) and v != v):
                buf.push(v, int(events_ts[ei]))
            ei += 1
        if w is not None:
            buf.evict_older_than(int(round_down(q - w, hop)))
        ir = buf.query()
        out.append(None if ir is None else op.finalize(_clone(ir, op)))
    return out
