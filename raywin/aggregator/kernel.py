"""Vectorized partition-local aggregation kernel.

This is the compute kernel that runs inside ``groupby(bucket).map_groups`` /
actor-pool ``map_batches`` stages after the hash(entity)xtime shuffle.  Given
one co-partitioned group of (events, queries) it evaluates every
AggregationPart at every query timestamp under the sawtooth membership rule

    round(q - w, tail_hop) <= ev.ts < round(q, head_rounding)

(reference NaiveAggregator.scala:38-44; head_rounding=1 for TEMPORAL).

Design — everything is numpy over the whole partition, no per-row Python in
the hot ops (reference mutates Array[Any] rows one at a time,
RowAggregator.scala:25-29; we instead exploit Arrow/numpy columns):

  * events sorted once by (entity_code, ts, tie); queries by (entity_code, ts)
  * per-query window bounds found with ONE composite-key ``np.searchsorted``
    per (window, side) over the whole partition
  * engines per operation class:
      - PREFIX   sum/count/average: cumsum arrays, result = prefix[r]-prefix[l]
      - POSITION first/last/first_k/last_k: direct slices of the sorted,
        null-compressed value array (no aggregation tree needed at all)
      - SEGTREE  min/max/variance/skew/kurtosis/top_k/bottom_k: disjoint
        binary-block segment tree with *vectorized* monoid merges; O(log n)
        lockstep merge rounds for all queries at once
      - OBJECT   unique_count/histogram/sketches/bucketed/element-wise: hop
        tiles (prepare_many per tile) + per-query python merges — mirrors the
        reference HopsAggregator -> SawtoothAggregator stitch
        (HopsAggregator.scala:33-165, SawtoothAggregator.scala:64-139)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..api import AggregationPart, Operation
from .scalar_ops import ScalarOp, make_scalar_op
from .npfast import cumsum1d
from .windowing import FiveMinuteResolution, round_down

_PREFIX_OPS = {Operation.SUM, Operation.COUNT, Operation.AVERAGE}
_POSITION_OPS = {Operation.FIRST, Operation.LAST, Operation.FIRST_K, Operation.LAST_K}
_SEGTREE_OPS = {
    Operation.MIN,
    Operation.MAX,
    Operation.VARIANCE,
    Operation.SKEW,
    Operation.KURTOSIS,
    Operation.TOP_K,
    Operation.BOTTOM_K,
}

_NEG_INF = np.iinfo(np.int64).min // 4

_MAX_EXACT = float(1 << 52)


def round_half_away(x: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero, matching DuckDB's round()/CAST-to-int —
    np.rint would round half-to-even and diverge at exact .5 ties."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def detect_decimal(vals: np.ndarray, valid: np.ndarray, max_scale: int = 4):
    """If every valid value is (within fp noise) a decimal with <= max_scale
    fractional digits, return (digits d, int64 scaled values with invalid->0);
    else None.

    Enables EXACT fixed-point aggregation: float SUM/AVERAGE/moments computed
    as int64/bigint sums are bitwise-deterministic across partitionings and
    merge orders, unlike float accumulation (the reference aggregates Scala
    Doubles sequentially, SimpleAggregators.scala:69-88 — deterministic only
    single-threaded; exact ints are the distributed-safe equivalent)."""
    if vals is None or vals.dtype.kind != "f":
        return None
    v = np.where(valid, vals, 0.0)
    if not np.isfinite(v).all():
        return None
    for d in range(max_scale + 1):
        scaled = v * (10.0**d)
        m = np.max(np.abs(scaled)) if len(scaled) else 0.0
        if m >= _MAX_EXACT:
            return None
        r = round_half_away(scaled)
        # tolerance: fp noise of products/parquet decode, far below 0.5.
        # The 1e-6 floor shrinks with the scaled magnitude: data whose
        # values are ALL tiny (max |scaled| << 1) must not be swallowed
        # as "decimal zero" — for real decimal data the accepting scale
        # has max |scaled| >= ~1, so the floor stays 1e-6 there.
        if np.max(np.abs(scaled - r), initial=0.0) <= min(1e-6, m * 1e-3) + m * 1e-11:
            return d, r.astype(np.int64)
    return None


def _power_prefix(sv: np.ndarray, p: int):
    """Exact exclusive prefix sums of sv**p: int64 when bounds allow, else
    arbitrary-precision Python ints (object dtype)."""
    n = len(sv)
    m = int(np.max(np.abs(sv))) if n else 0
    if n * (m**p) < (1 << 62):
        a = sv.astype(np.int64) ** p
        cs = np.zeros(n + 1, dtype=np.int64)
        cs[1:] = np.cumsum(a)
        return cs
    a = sv.astype(object) ** p
    cs = np.zeros(n + 1, dtype=object)
    if n:
        cs[1:] = np.cumsum(a)
    return cs


def _mix_codes(combined_codes: list[np.ndarray]) -> np.ndarray:
    """Radix-mix per-column factor codes into joint entity codes (int64,
    encounter order).

    Re-factorizes the running mix whenever the next radix step could overflow
    int64 (3+ high-cardinality key columns) — after a re-factorize the running
    codes are < n_rows, so ``mixed * card + codes`` stays < n_rows**2 < 2**62
    for any realistic partition.  Encounter order is preserved: factorize of
    the mixed values yields the same first-seen ordering as factorize of the
    key tuples themselves."""
    mixed = combined_codes[0].astype(np.int64)
    run_card = int(mixed.max()) + 1 if len(mixed) else 1
    for ci in range(1, len(combined_codes)):
        codes = combined_codes[ci]
        card = int(codes.max()) + 1 if len(codes) else 1
        if run_card * card >= (1 << 62):
            mixed, _ = pd.factorize(mixed)
            mixed = mixed.astype(np.int64)
            run_card = int(mixed.max()) + 1 if len(mixed) else 1
        mixed = mixed * np.int64(card) + codes
        run_card *= card
    joint, _ = pd.factorize(mixed)
    return joint


def factorize_multi(columns_list: list[list[np.ndarray]]) -> tuple[list[np.ndarray], int]:
    """Jointly factorize tuples of key columns across several frames.

    Returns per-frame int64 entity codes and the number of distinct entities.
    """
    lens = [len(cols[0]) if cols else 0 for cols in columns_list]
    ncols = len(columns_list[0])
    combined_codes = []
    for ci in range(ncols):
        concat = np.concatenate([np.asarray(cols[ci], dtype=object) for cols in columns_list])
        codes, _ = pd.factorize(concat, use_na_sentinel=False)
        combined_codes.append(codes)
    if ncols == 1:
        joint = combined_codes[0]
    else:
        joint = _mix_codes(combined_codes)
    n_entities = int(joint.max()) + 1 if len(joint) else 0
    out, off = [], 0
    for ln in lens:
        out.append(joint[off : off + ln].astype(np.int64))
        off += ln
    return out, n_entities


class _PandasFrame:
    """Minimal column-access facade over a pandas DataFrame (test /
    compatibility path of PartitionAggregator)."""

    __slots__ = ("df",)

    def __init__(self, df: pd.DataFrame):
        self.df = df

    def __len__(self):
        return len(self.df)

    @property
    def names(self):
        return list(self.df.columns)

    def np_col(self, name: str) -> np.ndarray:
        return self.df[name].to_numpy()

    def take(self, order: np.ndarray) -> "_PandasFrame":
        return _PandasFrame(self.df.iloc[order].reset_index(drop=True))


class _ArrowFrame:
    """Lazy column-access facade over a pyarrow Table — the kernel hot path.

    Numeric columns convert zero-copy (or near) to numpy; string / list
    columns convert to object arrays ONLY when an aggregation part actually
    touches them; map columns go through the per-column pandas conversion
    (``maps_as_pydicts``) so cells reach the kernel as dicts.  Passthrough
    columns (the left side's payload) are never converted at all — the caller
    reorders the original Arrow table with ``Table.take``.  Replaces the old
    whole-table ``to_pandas(maps_as_pydicts="strict")`` that boxed every
    string and list cell per co-partitioned group."""

    __slots__ = ("table", "_order", "_cache")

    def __init__(self, table: pa.Table, order: np.ndarray | None = None):
        self.table = table
        self._order = order  # lazy take: applied per requested column
        self._cache: dict[str, np.ndarray] = {}

    def __len__(self):
        return self.table.num_rows if self._order is None else len(self._order)

    @property
    def names(self):
        return self.table.column_names

    def np_col(self, name: str) -> np.ndarray:
        if name not in self._cache:
            col = self.table.column(name)
            if self._order is not None:
                col = col.take(self._order)
            t = col.type
            if pa.types.is_map(t):
                arr = col.to_pandas(maps_as_pydicts="strict").to_numpy()
            else:
                arr = col.to_numpy(zero_copy_only=False)
            self._cache[name] = arr
        return self._cache[name]

    def take(self, order: np.ndarray) -> "_ArrowFrame":
        if self._order is not None:
            order = np.asarray(self._order)[order]
        return _ArrowFrame(self.table, order)


def _factorize_frames(evf, qf, key_cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Joint entity codes for (events, queries) key tuples.

    Arrow fast path: per-column ``dictionary_encode`` over the concatenated
    native buffers — no per-cell Python boxing (encounter-order codes match
    ``pd.factorize(use_na_sentinel=False)`` exactly when the column has no
    nulls, so sort orders and outputs are bitwise-unchanged vs the pandas
    path).  Null-bearing key columns fall back to the object path."""
    if isinstance(evf, _ArrowFrame) and isinstance(qf, _ArrowFrame):
        import pyarrow.compute as pc

        n_ev, n_q = len(evf), len(qf)
        combined_codes: list[np.ndarray] = []
        ok = True
        for c in key_cols:
            ev_col = evf.table.column(c)
            q_col = qf.table.column(c)
            if evf._order is not None:
                ev_col = ev_col.take(evf._order)
            if qf._order is not None:
                q_col = q_col.take(qf._order)
            if ev_col.null_count or q_col.null_count:
                ok = False
                break
            try:
                concat = pa.chunked_array(
                    list(ev_col.chunks) + list(q_col.chunks)
                ).combine_chunks()
                codes = pc.dictionary_encode(concat).indices.to_numpy(
                    zero_copy_only=False
                )
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                ok = False
                break
            combined_codes.append(codes.astype(np.int64))
        if ok:
            if len(combined_codes) == 1:
                joint = combined_codes[0]
            else:
                joint = _mix_codes(combined_codes).astype(np.int64)
            return joint[:n_ev], joint[n_ev:]
    (ev_ent, q_ent), _ = factorize_multi(
        [
            [evf.np_col(c) for c in key_cols],
            [qf.np_col(c) for c in key_cols],
        ]
    )
    return ev_ent, q_ent


class _Column:
    """Per-input-column preprocessed state over the sorted events."""

    def __init__(self, raw, ts_sorted: np.ndarray):
        if isinstance(raw, pd.Series):
            raw = raw.to_numpy()
        self.raw = raw
        self.is_list = False
        self.is_map = False
        if raw.dtype.kind == "f":
            self.valid = ~np.isnan(raw)
            self.numeric = raw
        elif raw.dtype.kind in "iub":
            self.valid = np.ones(len(raw), dtype=bool)
            self.numeric = raw
        else:  # object / string / list / map: None and nan are nulls
            self.valid = ~pd.isna(raw)  # scalar-aware: lists/dicts are not-na
            self.numeric = None
            probe = next((v for v in raw if v is not None), None)
            if isinstance(probe, (list, np.ndarray)):
                self.is_list = True
            elif isinstance(probe, dict):
                self.is_map = True
        self._list_stats = None
        # exclusive prefix count of valid values: cum_valid[i] = #valid in [0, i)
        self.cum_valid = np.zeros(len(raw) + 1, dtype=np.int64)
        self.cum_valid[1:] = cumsum1d(self.valid)
        self.comp_vals = raw[self.valid]  # null-compressed values, still ts-sorted
        self.comp_ts = ts_sorted[self.valid]
        self._cumsum = None
        self._decimal = False  # False = not probed; None = not decimal
        self._dec_prefix: dict[int, np.ndarray] = {}

    @property
    def decimal(self):
        """(digits, int64-scaled null-compressed values) or None."""
        if self._decimal is False:
            self._decimal = detect_decimal(
                self.comp_vals.astype(np.float64) if self.numeric is not None and len(self.comp_vals) else None,
                np.ones(len(self.comp_vals), dtype=bool),
            ) if self.numeric is not None else None
        return self._decimal

    def dec_prefix(self, p: int) -> np.ndarray:
        """Exact exclusive prefix sums of scaled**p over compressed values."""
        if p not in self._dec_prefix:
            self._dec_prefix[p] = _power_prefix(self.decimal[1], p)
        return self._dec_prefix[p]

    def compress(self, l: np.ndarray, r: np.ndarray):
        """Map raw index ranges to null-compressed index ranges."""
        return self.cum_valid[l], self.cum_valid[r]

    def list_stats(self):
        """Per-row (element_sum, element_count) for list columns with element
        nulls skipped — vectorized via one concatenation + reduceat (the
        auto-explode fast path for SUM/COUNT/AVERAGE over e.g. an embedding
        column; reference ColumnAggregator.scala:79-116 VectorDispatcher)."""
        if self._list_stats is None:
            n = len(self.raw)
            sums = np.zeros(n, dtype=np.float64)
            cnts = np.zeros(n, dtype=np.int64)
            idx = np.flatnonzero(self.valid)
            arrs = [np.asarray(self.raw[i], dtype=np.float64) for i in idx]
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
            if len(arrs) and lens.sum():
                flat = np.concatenate([a for a in arrs if len(a)])
                off = np.zeros(len(arrs), dtype=np.int64)
                np.cumsum(lens[:-1], out=off[1:])
                nanm = np.isnan(flat)
                nz = lens > 0
                seg_sums = np.add.reduceat(np.where(nanm, 0.0, flat), off[nz])
                seg_cnts = np.add.reduceat((~nanm).astype(np.int64), off[nz])
                sums[idx[nz]] = seg_sums
                cnts[idx[nz]] = seg_cnts
            self._list_stats = (sums, cnts)
        return self._list_stats

    @property
    def cumsum(self) -> np.ndarray:
        if self._cumsum is None:
            if self.numeric is None:
                raise TypeError("sum/average over non-numeric column")
            vals = np.where(self.valid, self.numeric, 0)
            dtype = np.int64 if vals.dtype.kind in "iub" else np.float64
            cs = np.zeros(len(vals) + 1, dtype=dtype)
            cs[1:] = cumsum1d(vals, dtype=dtype)
            self._cumsum = cs
        return self._cumsum


# ---------------------------------------------------------------------------
# SEGTREE engine: vectorized monoid merges over disjoint binary blocks
# ---------------------------------------------------------------------------


class VectorIR:
    """Struct-of-arrays IR with validity; vectorized commutative merge."""

    fields: tuple[str, ...] = ()

    def __init__(self, part: AggregationPart):
        self.part = part

    def leaf(self, vals: np.ndarray) -> dict[str, np.ndarray]:
        raise NotImplementedError

    def combine(self, a: dict, b: dict) -> dict:
        raise NotImplementedError

    def finalize(self, state: dict, valid: np.ndarray):
        raise NotImplementedError

    def alloc(self, n: int, like: dict) -> dict:
        return {f: np.zeros((n,) + like[f].shape[1:], dtype=like[f].dtype) for f in self.fields}


class MinMaxIR(VectorIR):
    fields = ("v",)

    def __init__(self, part):
        super().__init__(part)
        self.is_min = part.operation is Operation.MIN

    def leaf(self, vals):
        return {"v": vals.copy()}

    def combine(self, a, b):
        if a["v"].dtype.kind == "O":
            take_b = np.array([y < x if self.is_min else y > x for x, y in zip(a["v"], b["v"])])
        else:
            take_b = b["v"] < a["v"] if self.is_min else b["v"] > a["v"]
        return {"v": np.where(take_b, b["v"], a["v"])}

    def finalize(self, state, valid):
        v = state["v"]
        if v.dtype.kind == "f":
            return np.where(valid, v, np.nan)
        out = v.astype(object)
        out[~valid] = None
        return out


class MomentsIR(VectorIR):
    """Welford (variance) / 4-moment (skew, kurtosis) vectorized merge
    (formulas from SimpleAggregators.scala:163-247, 872-975)."""

    def __init__(self, part):
        super().__init__(part)
        self.four = part.operation in (Operation.SKEW, Operation.KURTOSIS)
        self.fields = ("n", "m1", "m2", "m3", "m4") if self.four else ("n", "m1", "m2")

    def leaf(self, vals):
        v = vals.astype(np.float64)
        n = np.ones(len(v))
        z = np.zeros(len(v))
        out = {"n": n, "m1": v, "m2": z}
        if self.four:
            out["m3"] = z.copy()
            out["m4"] = z.copy()
        return out

    def combine(self, a, b):
        an, bn = a["n"], b["n"]
        n = an + bn
        delta = b["m1"] - a["m1"]
        m1 = (an * a["m1"] + bn * b["m1"]) / n
        m2 = a["m2"] + b["m2"] + delta * (delta / n) * an * bn
        out = {"n": n, "m1": m1, "m2": m2}
        if self.four:
            d2 = delta * delta
            m3 = (
                a["m3"]
                + b["m3"]
                + d2 * delta * an * bn * (an - bn) / (n * n)
                + 3.0 * delta * (an * b["m2"] - bn * a["m2"]) / n
            )
            m4 = (
                a["m4"]
                + b["m4"]
                + d2 * d2 * an * bn * (an * an - an * bn + bn * bn) / (n**3)
                + 6.0 * d2 * (an * an * b["m2"] + bn * bn * a["m2"]) / (n * n)
                + 4.0 * delta * (an * b["m3"] - bn * a["m3"]) / n
            )
            out["m3"] = m3
            out["m4"] = m4
        return out

    def finalize(self, state, valid):
        n, m2 = state["n"], state["m2"]
        with np.errstate(invalid="ignore", divide="ignore"):
            if self.part.operation is Operation.VARIANCE:
                out = m2 / n
            elif self.part.operation is Operation.SKEW:
                out = np.where((n < 3) | (m2 == 0), np.nan, np.sqrt(n) * state["m3"] / m2**1.5)
            else:
                out = np.where((n < 4) | (m2 == 0), np.nan, n * state["m4"] / (m2 * m2) - 3)
        return np.where(valid, out, np.nan)


class TopKIR(VectorIR):
    """(n, k) value matrices padded with +/-inf->nan; merge = concat+sort+slice."""

    fields = ("v",)

    def __init__(self, part):
        super().__init__(part)
        self.k = int(part.arg("k"))
        self.desc = part.operation is Operation.TOP_K

    def leaf(self, vals):
        n = len(vals)
        m = np.full((n, self.k), np.nan)
        m[:, 0] = vals.astype(np.float64)
        return {"v": m}

    def combine(self, a, b):
        cat = np.concatenate([a["v"], b["v"]], axis=1)
        if self.desc:
            cat = -np.sort(-cat, axis=1)  # descending, nans stay last
        else:
            cat = np.sort(cat, axis=1)
        return {"v": cat[:, : self.k]}

    def finalize(self, state, valid):
        out = np.empty(len(valid), dtype=object)
        v = state["v"]
        for i in range(len(valid)):
            if valid[i]:
                row = v[i]
                out[i] = [float(x) for x in row[~np.isnan(row)]]
            else:
                out[i] = None
        return out


def _make_vector_ir(part: AggregationPart) -> VectorIR:
    op = part.operation
    if op in (Operation.MIN, Operation.MAX):
        return MinMaxIR(part)
    if op in (Operation.VARIANCE, Operation.SKEW, Operation.KURTOSIS):
        return MomentsIR(part)
    return TopKIR(part)


class SegTree:
    """Bottom-up segment tree of VectorIR states; queries answered for all
    rows at once with O(log n) vectorized merge rounds."""

    def __init__(self, ir: VectorIR, vals: np.ndarray):
        self.ir = ir
        n = len(vals)
        self.n = n
        self.levels: list[dict] = []
        if n == 0:
            return
        state = ir.leaf(vals)
        self.levels.append(state)
        while n > 1:
            half = n // 2
            a = {f: state[f][0 : 2 * half : 2] for f in ir.fields}
            b = {f: state[f][1 : 2 * half : 2] for f in ir.fields}
            merged = ir.combine(a, b)
            if n % 2:
                merged = {f: np.concatenate([merged[f], state[f][-1:]]) for f in ir.fields}
            state = merged
            n = (n + 1) // 2
            self.levels.append(state)

    def query(self, l: np.ndarray, r: np.ndarray):
        """Aggregate over [l, r) per row; returns (state, valid)."""
        nq = len(l)
        ir = self.ir
        valid = np.zeros(nq, dtype=bool)
        if self.n == 0 or nq == 0:
            return None, valid
        acc = {f: np.zeros((nq,) + self.levels[0][f].shape[1:], dtype=self.levels[0][f].dtype) for f in ir.fields}
        l = l.copy()
        r = r.copy()
        for level in self.levels:
            if not (l < r).any():
                break
            m1 = ((l & 1) == 1) & (l < r)
            self._absorb(acc, valid, level, l, m1)
            l = np.where(m1, l + 1, l)
            m2 = ((r & 1) == 1) & (l < r)
            r = np.where(m2, r - 1, r)
            self._absorb(acc, valid, level, r, m2)
            l >>= 1
            r >>= 1
        return acc, valid

    def _absorb(self, acc, valid, level, idx, mask):
        rows = np.flatnonzero(mask)
        if len(rows) == 0:
            return
        g = idx[rows]
        a_valid = valid[rows]
        copy_rows, copy_g = rows[~a_valid], g[~a_valid]
        for f in self.ir.fields:
            acc[f][copy_rows] = level[f][copy_g]
        valid[copy_rows] = True
        both, bg = rows[a_valid], g[a_valid]
        if len(both):
            merged = self.ir.combine(
                {f: acc[f][both] for f in self.ir.fields},
                {f: level[f][bg] for f in self.ir.fields},
            )
            for f in self.ir.fields:
                acc[f][both] = merged[f]


# ---------------------------------------------------------------------------
# OBJECT engine helpers
# ---------------------------------------------------------------------------


class BucketedOp(ScalarOp):
    """Sub-key aggregation: IR = {bucket: inner_ir}; output map[bucket->out]
    (reference BucketedColumnAggregator.scala:1-94)."""

    def __init__(self, inner: ScalarOp):
        self.inner = inner
        self.timed = inner.timed
        self.order_sensitive = inner.order_sensitive

    def prepare(self, vb, ts=None):
        v, b = vb
        return {b: self.inner.prepare(v, ts)}

    def update(self, ir, vb, ts=None):
        v, b = vb
        sub = ir.get(b)
        ir[b] = self.inner.prepare(v, ts) if sub is None else self.inner.update(sub, v, ts)
        return ir

    def merge(self, ir1, ir2):
        for b, sub in ir2.items():
            if b in ir1:
                ir1[b] = self.inner.merge(ir1[b], sub)
            else:
                ir1[b] = sub
        return ir1

    def finalize(self, ir):
        return {b: self.inner.finalize(sub) for b, sub in ir.items()}


class ExplodeOp(ScalarOp):
    """Auto-explode list inputs: every element updates the inner op, as if
    each were its own row (reference ColumnAggregator.scala:79-116
    VectorDispatcher).  Element nulls are skipped."""

    def __init__(self, inner: ScalarOp):
        self.inner = inner
        self.timed = inner.timed
        self.order_sensitive = inner.order_sensitive

    def _fold(self, ir, vec, ts):
        for v in vec:
            if v is None or (isinstance(v, float) and v != v):
                continue
            if ir is None:
                ir = self.inner.prepare(v, ts) if self.timed else self.inner.prepare(v)
            else:
                ir = self.inner.update(ir, v, ts) if self.timed else self.inner.update(ir, v)
        return ir

    def prepare(self, vec, ts=None):
        return self._fold(None, vec, ts)

    def update(self, ir, vec, ts=None):
        return self._fold(ir, vec, ts)

    def merge(self, ir1, ir2):
        if ir1 is None:
            return ir2
        if ir2 is None:
            return ir1
        return self.inner.merge(ir1, ir2)

    def finalize(self, ir):
        return None if ir is None else self.inner.finalize(ir)


class MapColumnOp(ScalarOp):
    """Aggregate a map<key, value> column per key: IR = {key: inner_ir},
    output map<key, out> (reference MapColumnAggregator.scala:1-75)."""

    def __init__(self, inner_factory):
        self.inner_factory = inner_factory
        self._probe = inner_factory()
        self.timed = self._probe.timed
        self.order_sensitive = self._probe.order_sensitive

    def prepare(self, m, ts=None):
        return self.update({}, m, ts)

    def update(self, ir, m, ts=None):
        inner = self._probe
        for k, v in m.items():
            if v is None or (isinstance(v, float) and v != v):
                continue
            sub = ir.get(k)
            if sub is None:
                ir[k] = inner.prepare(v, ts) if self.timed else inner.prepare(v)
            else:
                ir[k] = inner.update(sub, v, ts) if self.timed else inner.update(sub, v)
        return ir

    def merge(self, ir1, ir2):
        inner = self._probe
        for k, sub in ir2.items():
            if k in ir1:
                ir1[k] = inner.merge(ir1[k], sub)
            else:
                ir1[k] = sub
        return ir1

    def finalize(self, ir):
        return {k: self._probe.finalize(sub) for k, sub in ir.items()}


class ElementWiseOp(ScalarOp):
    """Aggregate list columns element-wise (reference ElementWiseAggregator.scala)."""

    def __init__(self, inner: ScalarOp):
        self.inner = inner
        self.timed = inner.timed
        self.order_sensitive = inner.order_sensitive

    def prepare(self, vec, ts=None):
        return [self.inner.prepare(v, ts) for v in vec]

    def update(self, ir, vec, ts=None):
        for i, v in enumerate(vec):
            if i < len(ir):
                ir[i] = self.inner.update(ir[i], v, ts)
            else:
                ir.append(self.inner.prepare(v, ts))
        return ir

    def merge(self, ir1, ir2):
        for i, sub in enumerate(ir2):
            if i < len(ir1):
                ir1[i] = self.inner.merge(ir1[i], sub)
            else:
                ir1.append(sub)
        return ir1

    def finalize(self, ir):
        return [self.inner.finalize(sub) for sub in ir]


def _prepare_many(op: ScalarOp, vals, tss) -> object:
    ir = None
    if op.timed:
        for v, t in zip(vals, tss):
            ir = op.prepare(v, t) if ir is None else op.update(ir, v, t)
    else:
        for v in vals:
            ir = op.prepare(v) if ir is None else op.update(ir, v)
    return ir


def _clone_ir(ir):
    import copy

    return copy.deepcopy(ir)


class _TileTwoStack:
    """Two-stack sliding window over HOP-TILE IRs (banker's queue, the
    TwoStackLite trick applied at tile granularity): tile indices are pushed
    and evicted monotonically, each tile is cloned+merged an amortized O(1)
    number of times, and a window query costs at most two clones — replacing
    the old per-query loop that cloned and merged EVERY tile in the window.

    Mutation discipline: ScalarOp.merge may mutate its FIRST argument and may
    return an alias of either argument, so every stored IR is cloned before
    it becomes a merge's first argument, and query results are cloned before
    the caller may merge partial-tile IRs into them."""

    __slots__ = ("op", "front_idx", "front_ir", "back_idx", "back_irs", "back_ir")

    def __init__(self, op):
        from collections import deque

        self.op = op
        self.front_idx = deque()  # ascending tile index, oldest first
        self.front_ir = deque()   # suffix IRs: front_ir[i] folds tiles i..end
        self.back_idx: list[int] = []
        self.back_irs: list = []
        self.back_ir = None

    def push(self, t: int, ir):
        self.back_idx.append(t)
        self.back_irs.append(ir)
        leaf = _clone_ir(ir)
        self.back_ir = leaf if self.back_ir is None else self.op.merge(self.back_ir, leaf)

    def _flip(self):
        self.front_idx.extend(self.back_idx)
        irs: list = [None] * len(self.back_idx)
        acc = None
        for i in range(len(self.back_idx) - 1, -1, -1):
            leaf = _clone_ir(self.back_irs[i])
            acc = leaf if acc is None else self.op.merge(leaf, acc)
            irs[i] = acc
        self.front_ir.extend(irs)
        self.back_idx, self.back_irs, self.back_ir = [], [], None

    def evict_before(self, t0: int):
        while True:
            while self.front_idx and self.front_idx[0] < t0:
                self.front_idx.popleft()
                self.front_ir.popleft()
            if self.front_idx or not self.back_idx or self.back_idx[0] >= t0:
                return
            self._flip()

    def query_cloned(self):
        """Merged IR of every tile in the buffer, safe for the caller to
        mutate; None when empty."""
        front = self.front_ir[0] if self.front_ir else None
        if front is None:
            return None if self.back_ir is None else _clone_ir(self.back_ir)
        leaf = _clone_ir(front)
        if self.back_ir is None:
            return leaf
        return self.op.merge(leaf, _clone_ir(self.back_ir))


# ---------------------------------------------------------------------------
# The partition aggregator
# ---------------------------------------------------------------------------


class PartitionAggregator:
    """Evaluates agg parts for one co-partitioned (events, queries) group."""

    def __init__(
        self,
        key_cols: list[str],
        parts: list[AggregationPart],
        resolution=FiveMinuteResolution,
        head_rounding: int = 1,
        tie_breaker: str | None = None,
        dedupe_queries: bool = False,
    ):
        self.key_cols = key_cols
        self.parts = parts
        self.resolution = resolution
        self.head_rounding = head_rounding
        self.tie_breaker = tie_breaker
        self.dedupe_queries = dedupe_queries

    def aggregate(self, events: pd.DataFrame, queries: pd.DataFrame) -> pd.DataFrame:
        """events: key_cols + ts + inputs; queries: key_cols + ts + passthrough.
        Returns queries (re-ordered by (entity, ts)) + one column per part."""
        q_order, results = self._core(_PandasFrame(events), _PandasFrame(queries))
        out = queries.iloc[q_order].reset_index(drop=True)
        for part in self.parts:
            out[part.output_column] = results[part.output_column]
        return out

    def aggregate_tables(
        self, events: pa.Table, queries: pa.Table, extra_key_cols=()
    ) -> tuple[np.ndarray, dict[str, np.ndarray]]:
        """Arrow-native path: returns (q_order, per-part result arrays).

        The caller reorders the queries table with ``queries.take(q_order)``
        — passthrough columns never leave Arrow.  extra_key_cols joins the
        entity factorization (hot-key time chunking passes CHUNK_COL so
        chunk partitions stay separate even when two chunks of one key
        hash-collide into the same bucket)."""
        return self._core(
            _ArrowFrame(events), _ArrowFrame(queries), extra_key_cols
        )

    def _core(self, evf, qf, extra_key_cols=()) -> tuple[np.ndarray, dict[str, np.ndarray]]:
        ev_ent, q_ent = _factorize_frames(
            evf, qf, self.key_cols + list(extra_key_cols)
        )
        ev_ts = evf.np_col("ts").astype(np.int64)
        q_ts = qf.np_col("ts").astype(np.int64)

        if self.tie_breaker and self.tie_breaker in evf.names:
            tie = evf.np_col(self.tie_breaker)
            ev_order = np.lexsort((tie, ev_ts, ev_ent))
        else:
            ev_order = np.lexsort((ev_ts, ev_ent))
        q_order = np.lexsort((q_ts, q_ent))

        ev_ent_s, ev_ts_s = ev_ent[ev_order], ev_ts[ev_order]
        q_ent_s, q_ts_s = q_ent[q_order], q_ts[q_order]
        if self.dedupe_queries and len(q_ts_s):
            # dedupe (entity, ts) inside the co-partition shuffle — saves a
            # dedicated DISTINCT exchange (uniqSort analogue, GroupBy.scala:311)
            keep = np.ones(len(q_ts_s), dtype=bool)
            keep[1:] = (np.diff(q_ent_s) != 0) | (np.diff(q_ts_s) != 0)
            q_order = q_order[keep]
            q_ent_s, q_ts_s = q_ent_s[keep], q_ts_s[keep]
        events_s = evf.take(ev_order)

        n = len(ev_ts_s)
        if n:
            tmin = int(ev_ts_s.min())
            span = int(ev_ts_s.max()) - tmin + 2
            max_ent = int(max(ev_ent_s.max(initial=0), q_ent_s.max(initial=0))) + 1
            assert max_ent * span < (1 << 62), "composite key overflow; repartition finer"
            ev_key = ev_ent_s * np.int64(span) + (ev_ts_s - tmin)
        else:
            tmin, span, ev_key = 0, 1, np.zeros(0, dtype=np.int64)

        def bound_idx(bound_ts: np.ndarray) -> np.ndarray:
            off = np.clip(bound_ts - tmin, 0, span - 1)
            return np.searchsorted(ev_key, q_ent_s * np.int64(span) + off, side="left")

        # cache: (lower, upper) raw index bounds per (window_millis, hop)
        bounds_cache: dict = {}
        cols: dict[str, _Column] = {}
        segtrees: dict = {}

        def get_bounds(part: AggregationPart):
            if part.window.unbounded:
                key = ("unbounded",)
                if key not in bounds_cache:
                    upper = (
                        q_ts_s
                        if self.head_rounding == 1
                        else round_down(q_ts_s, self.head_rounding)
                    )
                    bounds_cache[key] = (bound_idx(np.full_like(q_ts_s, _NEG_INF)), bound_idx(upper))
                return bounds_cache[key]
            hop = self.resolution.tail_hop(part.window)
            key = (part.window.millis, hop)
            if key not in bounds_cache:
                upper_ts = (
                    q_ts_s if self.head_rounding == 1 else round_down(q_ts_s, self.head_rounding)
                )
                lower_ts = round_down(q_ts_s - part.window.millis, hop)
                bounds_cache[key] = (bound_idx(lower_ts), bound_idx(upper_ts))
            return bounds_cache[key]

        def get_col(name: str) -> _Column:
            if name not in cols:
                cols[name] = _Column(
                    events_s.np_col(name) if n else np.array([], dtype=object), ev_ts_s
                )
            return cols[name]

        results: dict[str, np.ndarray] = {}
        for part in self.parts:
            results[part.output_column] = self._eval_part(
                part, ev_ts_s, ev_ent_s, get_col, get_bounds, segtrees, len(q_ts_s)
            )
        return q_order, results

    # -- engines ----------------------------------------------------------

    def _eval_part(self, part, ev_ts_s, ev_ent_s, get_col, get_bounds, segtrees, nq):
        if len(ev_ts_s) == 0:
            return np.full(nq, None, dtype=object) if nq else np.array([], dtype=object)
        op = part.operation
        if part.bucket is not None or part.element_wise:
            return self._object_engine(part, ev_ts_s, ev_ent_s, get_col, get_bounds, nq)
        probe_col = get_col(part.input_column)
        if probe_col.is_list or probe_col.is_map:
            # auto-explode list inputs / per-key map aggregation
            # (reference ColumnAggregator.scala:79-116, MapColumnAggregator.scala)
            if probe_col.is_list and op in _PREFIX_OPS:
                return self._list_prefix_engine(part, probe_col, get_bounds)
            return self._object_engine(part, ev_ts_s, ev_ent_s, get_col, get_bounds, nq)
        if op in _PREFIX_OPS:
            return self._prefix_engine(part, get_col, get_bounds)
        if op in _POSITION_OPS:
            return self._position_engine(part, get_col, get_bounds, nq)
        if op in _SEGTREE_OPS:
            col = get_col(part.input_column)
            if col.numeric is None and op not in (Operation.MIN, Operation.MAX):
                return self._object_engine(part, ev_ts_s, ev_ent_s, get_col, get_bounds, nq)
            if (
                op in (Operation.VARIANCE, Operation.SKEW, Operation.KURTOSIS)
                and col.numeric is not None
                and col.decimal is not None
            ):
                return self._exact_moments_engine(part, col, get_bounds, nq)
            return self._segtree_engine(part, get_col, get_bounds, segtrees, nq)
        if op is Operation.APPROX_PERCENTILE:
            return self._percentile_engine(part, get_col, get_bounds, nq)
        return self._object_engine(part, ev_ts_s, ev_ent_s, get_col, get_bounds, nq)

    def _prefix_engine(self, part, get_col, get_bounds):
        col = get_col(part.input_column)
        l, r = get_bounds(part)
        cnt = col.cum_valid[r] - col.cum_valid[l]
        empty = cnt == 0
        if part.operation is Operation.COUNT:
            return _mask_int(cnt, empty)
        if col.numeric is not None and col.numeric.dtype.kind == "f" and col.decimal is not None:
            # EXACT fixed-point sum: bitwise-deterministic across partition
            # and merge order (matches an oracle summing scaled BIGINTs)
            d, _ = col.decimal
            lv, rv = col.compress(l, r)
            cs = col.dec_prefix(1)
            s = (cs[rv] - cs[lv]).astype(np.float64) / np.float64(10.0**d)
            if part.operation is Operation.SUM:
                return np.where(empty, np.nan, s)
            with np.errstate(invalid="ignore", divide="ignore"):
                return np.where(empty, np.nan, s / np.maximum(cnt, 1))
        cs = col.cumsum
        s = cs[r] - cs[l]
        if part.operation is Operation.SUM:
            if cs.dtype.kind == "i":
                return _mask_int(s, empty)
            return np.where(empty, np.nan, s)
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(empty, np.nan, s.astype(np.float64) / np.maximum(cnt, 1))

    def _list_prefix_engine(self, part, col, get_bounds):
        """Exploded SUM/COUNT/AVERAGE over a list column: per-row element
        sums/counts precomputed once, then the usual prefix-difference — the
        whole window aggregate without materializing the explosion."""
        sums, cnts = col.list_stats()
        cs_sum = np.zeros(len(sums) + 1, dtype=np.float64)
        cs_sum[1:] = cumsum1d(sums, dtype=np.float64)
        cs_cnt = np.zeros(len(cnts) + 1, dtype=np.int64)
        cs_cnt[1:] = cumsum1d(cnts, dtype=np.int64)
        l, r = get_bounds(part)
        cnt = cs_cnt[r] - cs_cnt[l]
        empty = cnt == 0
        if part.operation is Operation.COUNT:
            return _mask_int(cnt, empty)
        s = cs_sum[r] - cs_sum[l]
        if part.operation is Operation.SUM:
            return np.where(empty, np.nan, s)
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(empty, np.nan, s / np.maximum(cnt, 1))

    def _position_engine(self, part, get_col, get_bounds, nq):
        col = get_col(part.input_column)
        l, r = get_bounds(part)
        lv, rv = col.compress(l, r)
        has = rv > lv
        vals = col.comp_vals
        op = part.operation
        if op in (Operation.FIRST, Operation.LAST):
            if len(vals) == 0:  # every value in the partition is null:
                # the placeholder index 0 below would be out of bounds
                out = np.empty(nq, dtype=object)
                out[:] = None
                return out
            idx = np.where(has, np.where(op is Operation.FIRST, lv, rv - 1), 0)
            picked = vals[idx]
            out = np.empty(nq, dtype=object)
            out[:] = picked
            out[~has] = None
            return out
        k = int(part.arg("k"))
        if op is Operation.LAST_K:
            start = np.maximum(lv, rv - k)
            lengths = np.where(has, rv - start, 0)
            # flat indices: rv-1, rv-2, ... descending ts (most recent first)
            flat = _ranges(rv - 1, lengths, step=-1)
        else:  # FIRST_K
            end = np.minimum.reduce([rv, lv + k])
            lengths = np.where(has, end - lv, 0)
            flat = _ranges(lv, lengths, step=1)
        picked = vals[flat]
        offsets = np.zeros(nq + 1, dtype=np.int64)
        offsets[1:] = cumsum1d(lengths, dtype=np.int64)
        out = np.empty(nq, dtype=object)
        # bulk path: most windows hold >= k events, so their rows are exactly
        # k long — one reshape+tolist for all of them beats per-row slicing
        full = lengths == k
        n_full = int(full.sum())
        if n_full:
            fidx = np.flatnonzero(full)
            rows = picked[_ranges(offsets[fidx], np.full(n_full, k), step=1)]
            out[fidx] = np.fromiter(rows.reshape(-1, k).tolist(), dtype=object, count=n_full)
        for i in np.flatnonzero(~full):
            out[i] = list(picked[offsets[i] : offsets[i + 1]]) if lengths[i] else None
        return out

    def _segtree_engine(self, part, get_col, get_bounds, segtrees, nq):
        col = get_col(part.input_column)
        tree_key = (part.input_column, part.operation, part.arg("k"))
        if tree_key not in segtrees:
            ir = _make_vector_ir(part)
            segtrees[tree_key] = SegTree(ir, col.comp_vals)
        tree = segtrees[tree_key]
        l, r = get_bounds(part)
        lv, rv = col.compress(l, r)
        state, valid = tree.query(lv, rv)
        if state is None:
            return np.full(nq, None, dtype=object)
        return tree.ir.finalize(state, valid)

    def _exact_moments_engine(self, part, col, get_bounds, nq):
        """Variance/skew/kurtosis from EXACT integer power sums of the
        fixed-point-scaled values, finalized with a fixed double-op sequence.

        The power sums are order-independent integers, so the result is
        bitwise identical however the partition was ordered or merged — and
        matches an oracle computing sum(sv^k) in BIGINT/HUGEINT then applying
        the same double expressions:
            M2 = s2 - s1*(s1/n);  M3 = s3 - (3*m)*s2 + ((2*m)*m)*s1
            M4 = s4 - (4*m)*s3 + ((6*m)*m)*s2 - (((3*m)*m)*m)*s1
            var = M2/n;  skew = sqrt(n)*M3/(M2*sqrt(M2));
            kurt = n*M4/(M2*M2) - 3            (m = s1/n)
        """
        op = part.operation
        d, _ = col.decimal
        l, r = get_bounds(part)
        lv, rv = col.compress(l, r)
        n = (rv - lv).astype(np.float64)
        scale = np.float64(10.0**d)

        def psum(p):
            cs = col.dec_prefix(p)
            sf = (cs[rv] - cs[lv]).astype(np.float64)
            return sf / (scale**p)

        s1 = psum(1)
        s2 = psum(2)
        with np.errstate(invalid="ignore", divide="ignore"):
            m = s1 / n
            m2 = s2 - s1 * m
            if op is Operation.VARIANCE:
                out = np.where(n >= 1, m2 / n, np.nan)
            elif op is Operation.SKEW:
                s3 = psum(3)
                m3 = s3 - (3 * m) * s2 + ((2 * m) * m) * s1
                out = np.where(
                    (n >= 3) & (m2 > 0), np.sqrt(n) * m3 / (m2 * np.sqrt(m2)), np.nan
                )
            else:
                s3 = psum(3)
                s4 = psum(4)
                m4 = s4 - (4 * m) * s3 + ((6 * m) * m) * s2 - (((3 * m) * m) * m) * s1
                out = np.where((n >= 4) & (m2 > 0), n * m4 / (m2 * m2) - 3, np.nan)
        return np.where(n >= 1, out, np.nan)

    def _percentile_engine(self, part, get_col, get_bounds, nq):
        """Percentiles over the window's value slice — exact (linear
        interpolation), deterministic and partition-independent, unlike a
        merge-order-dependent sketch.

        Two paths chosen by estimated work:
          * small windows: per-query sort of the slice (vectorizable constant)
          * hot keys / wide windows: ONE sliding-window pass with a Fenwick
            tree over value ranks — both window bounds are monotone
            non-decreasing over the (entity, ts)-sorted partition, so every
            query is answered in O(log n) after amortized O(1) adds/removes.
            This is the skew answer for percentile (SURVEY.md §7.5 #5).
        """
        import json as _json

        pct = part.arg("percentiles")
        if isinstance(pct, str):
            pct = _json.loads(pct)
        pct = np.asarray(list(pct) if pct else [0.5], dtype=np.float64)
        # interpolation="disc": nearest-rank (ceil(p*n)-1), the SQL
        # quantile_disc convention — returns actual data elements, so results
        # are exactly reproducible by an oracle; default linear interpolates
        disc = part.arg("interpolation") == "disc"
        col = get_col(part.input_column)
        l, r = get_bounds(part)
        lv, rv = col.compress(l, r)
        vals = col.comp_vals.astype(np.float64)
        out = np.empty(nq, dtype=object)
        counts = rv - lv
        total_work = int(counts.sum())

        def slice_exact(indices):
            for i in indices:
                a, b = int(lv[i]), int(rv[i])
                if a >= b:
                    out[i] = None
                    continue
                v = np.sort(vals[a:b])
                if disc:
                    idx = np.maximum(np.ceil(pct * len(v)).astype(np.int64) - 1, 0)
                    out[i] = [float(x) for x in v[np.minimum(idx, len(v) - 1)]]
                    continue
                pos = pct * (len(v) - 1)
                lo = np.floor(pos).astype(np.int64)
                hi = np.minimum(lo + 1, len(v) - 1)
                frac = pos - lo
                out[i] = [float(x) for x in v[lo] * (1 - frac) + v[hi] * frac]

        if total_work <= 64 * max(nq, 1):
            slice_exact(range(nq))
            return out
        if total_work > 4_000_000:
            # hybrid: tiny windows exact (global-bin quantization would be
            # coarse relative to a handful of values), big windows binned
            small = counts <= 64
            slice_exact(np.flatnonzero(small))
            big_idx = np.flatnonzero(~small)
            if len(big_idx):
                # bin budget = the requested sketch size k (reference maps k
                # to KLL accuracy, SimpleAggregators.scala:383-392); rank
                # error <= window/n_bins
                try:
                    n_bins = int(part.arg("k") or 256)
                except (TypeError, ValueError):
                    n_bins = 256
                binned = self._binned_percentiles(
                    vals, lv[big_idx], rv[big_idx], pct, len(big_idx),
                    n_bins=min(max(n_bins, 64), 1024),
                )
                out[big_idx] = binned
            return out
        # Fenwick sliding window over value ranks
        n = len(vals)
        order = np.argsort(vals, kind="stable")
        rank_of_pos = np.empty(n, dtype=np.int64)
        rank_of_pos[order] = np.arange(n)
        sorted_vals = vals[order]
        tree = [0] * (n + 1)

        def update(pos, delta):
            i = pos + 1
            while i <= n:
                tree[i] += delta
                i += i & (-i)

        log2n = max(1, n.bit_length())

        def select(k):
            """Position (1-based tree index) of the (k+1)-th present rank."""
            idx = 0
            rem = k + 1
            bit = 1 << log2n
            while bit:
                nxt = idx + bit
                if nxt <= n and tree[nxt] < rem:
                    idx = nxt
                    rem -= tree[nxt]
                bit >>= 1
            return idx  # 0-based rank = idx

        cur_l = cur_r = 0
        pcts = pct.tolist()
        for i in range(nq):
            a, b = int(lv[i]), int(rv[i])
            while cur_r < b:
                update(rank_of_pos[cur_r], 1)
                cur_r += 1
            while cur_l < a:
                update(rank_of_pos[cur_l], -1)
                cur_l += 1
            cnt = b - a
            if cnt <= 0:
                out[i] = None
                continue
            res = []
            for p in pcts:
                if disc:
                    k_ = min(max(int(np.ceil(p * cnt)) - 1, 0), cnt - 1)
                    res.append(float(sorted_vals[select(k_)]))
                    continue
                pos = p * (cnt - 1)
                lo = int(pos)
                frac = pos - lo
                v_lo = sorted_vals[select(lo)]
                v_hi = sorted_vals[select(min(lo + 1, cnt - 1))] if frac else v_lo
                res.append(float(v_lo * (1 - frac) + v_hi * frac))
            out[i] = res
        return out

    def _binned_percentiles(self, vals, lv, rv, pct, nq, n_bins: int = 256,
                            chunk: int = 8192):
        """Fully vectorized approximate percentiles for very hot keys: values
        quantized to equi-depth bins, per-bin cumulative counts snapshotted at
        every needed window boundary, per-query CDF via two gathers.  Rank
        error <= window/n_bins — the hybrid exact->approx pattern of the
        reference's ApproxHistogram (SimpleAggregators.scala:459-601).

        Queries are processed in chunks so the temporary arrays stay a few MB
        — same-size allocations then reuse warm arena pages (page faults on
        fresh memory are the scarce resource here, see raywin/__init__)."""
        n = len(vals)
        sample = vals if n <= 100_000 else vals[:: max(1, n // 100_000)]
        edges = np.unique(np.quantile(np.sort(sample), np.linspace(0, 1, n_bins + 1)))
        if len(edges) < 2:
            # (near-)constant distribution: one collapsed edge — every
            # non-empty window's percentiles are that constant
            const = float(edges[0]) if len(edges) else float("nan")
            out = np.empty(nq, dtype=object)
            for j in range(nq):
                out[j] = None if rv[j] <= lv[j] else [const] * len(pct)
            return out
        centers = (edges[:-1] + edges[1:]) / 2
        nb = len(centers)
        bin_idx = np.clip(np.searchsorted(edges, vals, side="right") - 1, 0, nb - 1)
        out = np.empty(nq, dtype=object)
        # Global block prefix: counts per bin of all events in blocks [0, b).
        # With it, the cumulative count at any boundary p is
        #   block_prefix[p // bs] + (events in [bs*(p//bs), p))
        # so each chunk only scans the few blocks its own boundaries fall in
        # (O(total events) across ALL chunks) instead of re-scanning from the
        # chunk's min boundary (O(events x chunks) on wide windows).
        bs = 2048
        n_blocks = n // bs + 1
        block_prefix = np.zeros((n_blocks + 1, nb), dtype=np.int32)
        np.add.at(block_prefix[1:], (np.arange(n) // bs, bin_idx), 1)
        np.cumsum(block_prefix, axis=0, out=block_prefix)
        # preallocated per-call buffers reused across chunks: fresh multi-MB
        # temporaries pay ~0.5 ms/page first-touch faults in this sandbox,
        # which made the unbuffered version ~10x slower (cumsum(out=) reuses
        # these warm pages instead)
        snaps_buf = np.zeros((2 * chunk + 2, nb), dtype=np.int32)
        gl_buf = np.empty((chunk, nb), dtype=np.int32)
        gr_buf = np.empty((chunk, nb), dtype=np.int32)
        cdf_buf = np.empty((chunk, nb), dtype=np.int32)
        for c0 in range(0, nq, chunk):
            c1 = min(c0 + chunk, nq)
            w = c1 - c0
            clv, crv = lv[c0:c1], rv[c0:c1]
            positions = np.unique(np.concatenate([clv, crv]))
            npos = len(positions)
            # within-block partial counts at each boundary via a diff array:
            # event e in block b adds +1 to boundary rows after it and -1 past
            # the block's last row, so a column cumsum yields, per row i,
            # the count of events in [block_start(p_i), p_i)
            pb = positions // bs
            ub, first = np.unique(pb, return_index=True)
            row_end = np.empty(len(ub), dtype=np.int64)
            row_end[:-1] = first[1:]
            row_end[-1] = npos
            scan_start = ub * bs
            lens = positions[row_end - 1] - scan_start
            tot = int(lens.sum())
            snaps = snaps_buf[: npos + 1]
            snaps[:] = 0
            if tot:
                cum = np.cumsum(lens)
                ev_idx = (
                    np.arange(tot)
                    - np.repeat(cum - lens, lens)
                    + np.repeat(scan_start, lens)
                )
                ev_bins = bin_idx[ev_idx]
                np.add.at(
                    snaps, (np.searchsorted(positions, ev_idx, side="right"), ev_bins), 1
                )
                np.subtract.at(snaps, (np.repeat(row_end, lens), ev_bins), 1)
            np.cumsum(snaps, axis=0, out=snaps)
            snaps[:npos] += block_prefix[pb]  # absolute counts in [0, p_i)
            li = np.searchsorted(positions, clv)
            ri = np.searchsorted(positions, crv)
            gl, gr = gl_buf[:w], gr_buf[:w]
            np.take(snaps, li, axis=0, out=gl)
            np.take(snaps, ri, axis=0, out=gr)
            counts = np.subtract(gr, gl, out=gr)
            cdf = np.cumsum(counts, axis=1, out=cdf_buf[:w])
            totals = cdf[:, -1]
            picks = np.empty((len(pct), w), dtype=np.int64)
            for pi, p in enumerate(pct):
                target = np.maximum(1, np.ceil(p * totals)).astype(np.int32)
                picks[pi] = np.minimum((cdf < target[:, None]).sum(axis=1), nb - 1)
            rows = centers[picks].T.tolist()  # (w, n_pct) python lists in one hop
            empty = totals == 0
            for j in range(w):
                out[c0 + j] = None if empty[j] else rows[j]
        return out

    def _object_engine(self, part, ev_ts_s, ev_ent_s, get_col, get_bounds, nq):
        op = make_scalar_op(part)
        col = get_col(part.input_column)
        if part.element_wise:
            op = ElementWiseOp(op)
        elif col.is_list and part.bucket is None:
            op = ExplodeOp(op)
        elif col.is_map and part.bucket is None:
            op = MapColumnOp(lambda: make_scalar_op(part))
        valid = col.valid
        if part.bucket is not None:
            bcol = get_col(part.bucket)
            valid = valid & bcol.valid
            vals_all = list(zip(col.raw, bcol.raw))
            op = BucketedOp(op)
        else:
            vals_all = col.raw
        l, r = get_bounds(part)
        out = np.empty(nq, dtype=object)
        if part.window.unbounded:
            hop = self.resolution.hop_sizes[0]
        else:
            hop = self.resolution.tail_hop(part.window)
        # hop tiles over the sorted events (contiguous per (entity, hop))
        hop_start = round_down(ev_ts_s, hop)
        tile_break = np.ones(len(ev_ts_s), dtype=bool)
        tile_break[1:] = (np.diff(hop_start) != 0) | (np.diff(ev_ent_s) != 0)
        tile_idx = cumsum1d(tile_break) - 1
        tile_bounds = np.flatnonzero(tile_break)
        tile_bounds = np.append(tile_bounds, len(ev_ts_s))
        tiles: dict[int, object] = {}

        def tile_ir(t):
            if t not in tiles:
                a, b = tile_bounds[t], tile_bounds[t + 1]
                m = valid[a:b]
                if not m.any():
                    tiles[t] = None
                else:
                    vs = [vals_all[i] for i in range(a, b) if valid[i]]
                    ts = ev_ts_s[a:b][m]
                    tiles[t] = _prepare_many(op, vs, ts)
            return tiles[t]

        def raw_ir(aa: int, bb: int):
            m = valid[aa:bb]
            if not m.any():
                return None
            vs = [vals_all[j] for j in range(aa, bb) if valid[j]]
            return _prepare_many(op, vs, ev_ts_s[aa:bb][m])

        if getattr(op, "order_sensitive", False):
            # lossy sketches give different (equally valid) results under a
            # different merge fold; keep them on the fixed ascending-tile
            # fold so outputs are reproducible run to run AND SQL-oracle-
            # mirrorable.  Amortization WITHOUT changing the fold: queries
            # sharing a window-start tile share an incrementally-extended
            # ascending prefix fold (identical merge sequence per query, so
            # bitwise-identical outputs); sawtooth lows are hop-aligned, so
            # the start tile is never partial on the temporal path and the
            # cache hits for every query inside a hop.
            cache_t0 = None
            cache_t1 = -1
            cache_ir = None
            for i in range(nq):
                li, ri = int(l[i]), int(r[i])
                if li >= ri:
                    out[i] = None
                    continue
                t0, t1 = int(tile_idx[li]), int(tile_idx[ri - 1])
                head_partial = tile_bounds[t0] < li
                tail_partial = tile_bounds[t1 + 1] > ri
                if head_partial or (t0 == t1 and tail_partial):
                    # non-hop-aligned low (or single partial tile): exact
                    # per-query ascending fold, unchanged
                    ir = None
                    for t in range(t0, t1 + 1):
                        a, b = tile_bounds[t], tile_bounds[t + 1]
                        if li <= a and b <= ri:
                            sub = tile_ir(t)
                        else:
                            sub = raw_ir(max(a, li), min(b, ri))
                        if sub is None:
                            continue
                        ir = _clone_ir(sub) if ir is None else op.merge(ir, _clone_ir(sub))
                    out[i] = None if ir is None else op.finalize(ir)
                    continue
                ft1 = t1 - 1 if tail_partial else t1
                if cache_t0 != t0 or cache_t1 > ft1:
                    cache_t0, cache_t1, cache_ir = t0, t0 - 1, None
                for t in range(cache_t1 + 1, ft1 + 1):
                    sub = tile_ir(t)
                    if sub is not None:
                        cache_ir = (
                            _clone_ir(sub)
                            if cache_ir is None
                            else op.merge(cache_ir, _clone_ir(sub))
                        )
                cache_t1 = max(cache_t1, ft1)
                ir = None if cache_ir is None else _clone_ir(cache_ir)
                if tail_partial:
                    sub = raw_ir(int(tile_bounds[t1]), ri)
                    if sub is not None:
                        ir = sub if ir is None else op.merge(ir, sub)
                out[i] = None if ir is None else op.finalize(ir)
            return out

        # queries arrive sorted by (entity, ts) and bounds come from one
        # composite searchsorted, so [t0, t1] advances monotonically — a
        # two-stack over full tiles gives amortized O(1) clone+merge per
        # tile; only the (<= 2) partial head/tail tiles aggregate raw.
        # Merge order vs the old ascending-tile loop differs only for
        # equal-ts ties, which always share a hop tile, so results match.
        stack = _TileTwoStack(op)
        pushed = -1
        for i in range(nq):
            li, ri = int(l[i]), int(r[i])
            if li >= ri:
                out[i] = None
                continue
            t0, t1 = int(tile_idx[li]), int(tile_idx[ri - 1])
            head_partial = tile_bounds[t0] < li
            tail_partial = tile_bounds[t1 + 1] > ri
            ft0 = t0 + 1 if head_partial else t0
            ft1 = t1 - 1 if tail_partial else t1
            stack.evict_before(ft0)
            if ft1 >= ft0:
                for t in range(max(pushed + 1, ft0), ft1 + 1):
                    sub = tile_ir(t)
                    if sub is not None:
                        stack.push(t, sub)
                pushed = max(pushed, ft1)
                ir = stack.query_cloned()
            else:
                ir = None
            if t0 == t1 and (head_partial or tail_partial):
                sub = raw_ir(li, ri)  # single partially-covered tile
                if sub is not None:
                    ir = sub if ir is None else op.merge(ir, sub)
            else:
                if head_partial:
                    sub = raw_ir(li, int(tile_bounds[t0 + 1]))
                    if sub is not None:
                        ir = sub if ir is None else op.merge(ir, sub)
                if tail_partial:
                    sub = raw_ir(int(tile_bounds[t1]), ri)
                    if sub is not None:
                        ir = sub if ir is None else op.merge(ir, sub)
            out[i] = None if ir is None else op.finalize(ir)
        return out


def _mask_int(vals: np.ndarray, empty: np.ndarray):
    out = vals.astype(object)
    out[empty] = None
    return out


def _ranges(starts: np.ndarray, lengths: np.ndarray, step: int) -> np.ndarray:
    """Concatenate arithmetic ranges [starts[i], starts[i] +/- lengths[i])."""
    total = int(lengths.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    offsets[1:] = cumsum1d(lengths, dtype=np.int64)
    flat = np.repeat(starts, lengths)
    within = np.arange(total) - np.repeat(offsets[:-1], lengths)
    return flat + step * within
