"""Property tests for the consistency-compare edit distance vs an
independent textbook recursive LCS: identity, role symmetry, and exact
agreement on the insert/delete decomposition.  (difflib.SequenceMatcher is
NOT a valid oracle here — its block matching is non-optimal, e.g. it finds
lcs=1 for 'abca' vs 'ba' where the true LCS 'ba' has length 2.)"""

from functools import lru_cache

from hypothesis import given, settings
from hypothesis import strategies as st

from raywin.functions.compare import edit_distance

token = st.sampled_from(["a", "b", "c", "d"])
seq = st.lists(token, max_size=14)


def _lcs_len(a, b):
    a, b = tuple(a), tuple(b)

    @lru_cache(maxsize=None)
    def f(i, j):
        if i == len(a) or j == len(b):
            return 0
        if a[i] == b[j]:
            return 1 + f(i + 1, j + 1)
        return max(f(i + 1, j), f(i, j + 1))

    return f(0, 0)


@settings(max_examples=200, deadline=None)
@given(left=seq, right=seq)
def test_edit_distance_matches_difflib_lcs(left, right):
    ins, dele = edit_distance(left, right)
    lcs = _lcs_len(left, right)
    assert ins == len(left) - lcs
    assert dele == len(right) - lcs
    # swapping roles swaps the counts
    ins2, dele2 = edit_distance(right, left)
    assert (ins2, dele2) == (dele, ins)


@settings(max_examples=50, deadline=None)
@given(s=seq)
def test_edit_distance_identity_and_empty(s):
    assert edit_distance(s, s) == (0, 0)
    assert edit_distance(s, []) == (len(s), 0)
    assert edit_distance(None, s) == (0, len(s))
    assert edit_distance("".join(s), "".join(s)) == (0, 0)  # strings too
