"""IR-algebra property tests (SURVEY Appendix B #1 and #7):

  1. merge is associative and commutative-up-to-finalize for every op — any
     split of a value stream into partitions, merged in any order, finalizes
     to the same result as a single sequential pass;
  7. deletable ops: update then delete is the identity on the IR
     (BaseAggregator.scala:25-27, 51-58).

Pure-Python scalar ops (the ground-truth contract) — no Ray."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from raywin.api import Aggregation, Operation, Window
from raywin.aggregator.scalar_ops import make_scalar_op

# ops whose IRs are order-insensitive under merge (timed ops FIRST/LAST/_K
# depend on ts, fed distinct timestamps below so order is still well-defined)
OPS = [
    (Operation.SUM, {}),
    (Operation.COUNT, {}),
    (Operation.AVERAGE, {}),
    (Operation.MIN, {}),
    (Operation.MAX, {}),
    (Operation.VARIANCE, {}),
    (Operation.SKEW, {}),
    (Operation.KURTOSIS, {}),
    (Operation.FIRST, {}),
    (Operation.LAST, {}),
    (Operation.FIRST_K, {"k": 3}),
    (Operation.LAST_K, {"k": 3}),
    (Operation.TOP_K, {"k": 3}),
    (Operation.BOTTOM_K, {"k": 3}),
    (Operation.UNIQUE_COUNT, {}),
    (Operation.BOUNDED_UNIQUE_COUNT, {"k": 4}),
    (Operation.HISTOGRAM, {}),
    (Operation.APPROX_UNIQUE_COUNT, {}),
]

# the thrift enum COMMENT groups variance/skew/kurtosis as deletable, but the
# reference implementation says otherwise (SimpleAggregators.scala:247,972
# isDeletable=false) — parity follows the implementation
DELETABLE = [
    (Operation.SUM, {}),
    (Operation.COUNT, {}),
    (Operation.AVERAGE, {}),
    (Operation.HISTOGRAM, {}),
]


def _part(op, arg_map):
    return Aggregation(op, "v", windows=[Window(-1)], arg_map=arg_map or {}).unpack()[0]


def _ingest(op, values):
    ir = None
    for ts, v in values:
        ir = op.prepare(v, ts) if ir is None else op.update(ir, v, ts)
    return ir


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(_eq(a[k], b[k]) for k in a)
    return a == b


values_strategy = st.lists(
    st.one_of(
        st.integers(-20, 20).map(float),
        st.floats(-100, 100, allow_nan=False, width=32).map(float),
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=40, deadline=None)
@given(
    raw=values_strategy,
    cuts=st.lists(st.integers(0, 23), max_size=3),
    swap=st.booleans(),
    op_spec=st.sampled_from(OPS),
)
def test_merge_split_invariance(raw, cuts, swap, op_spec):
    opname, args = op_spec
    op = make_scalar_op(_part(opname, args))
    if opname in (Operation.HISTOGRAM,):
        vals = [str(int(v) % 5) for v in raw]
    elif opname in (Operation.UNIQUE_COUNT, Operation.BOUNDED_UNIQUE_COUNT,
                    Operation.APPROX_UNIQUE_COUNT):
        vals = [int(v) % 7 for v in raw]
    else:
        vals = raw
    stream = list(enumerate(vals))  # distinct increasing ts

    single = op.finalize(_ingest(op, stream))

    bounds = sorted({min(c, len(stream)) for c in cuts})
    pieces, prev = [], 0
    for b in bounds + [len(stream)]:
        if b > prev:
            pieces.append(stream[prev:b])
            prev = b
    irs = [_ingest(op, p) for p in pieces]
    if swap:
        irs = irs[::-1]  # commutativity of merge
    merged = irs[0]
    for ir in irs[1:]:
        merged = op.merge(merged, ir)
    assert _eq(op.finalize(merged), single), (opname, vals)


@settings(max_examples=40, deadline=None)
@given(
    raw=values_strategy,
    extra=st.floats(-50, 50, allow_nan=False, width=32),
    op_spec=st.sampled_from(DELETABLE),
)
def test_update_delete_identity(raw, extra, op_spec):
    opname, args = op_spec
    op = make_scalar_op(_part(opname, args))
    vals = [str(int(v) % 5) for v in raw] if opname is Operation.HISTOGRAM else raw
    x = str(int(extra) % 5) if opname is Operation.HISTOGRAM else float(extra)
    stream = list(enumerate(vals))

    base = _ingest(op, stream)
    round_trip = op.delete(op.update(base, x, len(stream)), x)
    assert _eq(op.finalize(round_trip), op.finalize(base)), (opname, vals, x)
