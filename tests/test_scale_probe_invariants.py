"""tools/scale_probe.py result-stability invariants (VERDICT r4 #4):
pure-function checks that the probe flags wrong-at-scale results, not
just slow-at-scale ones."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import invariant_fails, summarize_rows  # noqa: E402


class _Row:
    def __init__(self, **kw):
        self._d = kw

    def asDict(self):
        return self._d


def test_summarize_counts_ok_violations():
    rows = [_Row(recall_ok=True, x=1), _Row(recall_ok=False, x=2),
            _Row(recall_ok=None, x=3)]          # None is not a violation
    s = summarize_rows(rows)
    assert s == {"n_rows": 3, "ok_false": 1}


def test_bool_guarantee_must_hold_at_every_factor():
    good = {"n_rows": 5, "ok_false": 0}
    bad = {"n_rows": 5, "ok_false": 2}
    assert invariant_fails("sim_hnsw_recall", good, good, 10) == []
    fails = invariant_fails("sim_hnsw_recall", good, bad, 10)
    assert fails and "10x" in fails[0]
    fails = invariant_fails("sim_hnsw_recall", bad, good, 10)
    assert fails and "1x" in fails[0]


def test_fixed_cardinality_entries_must_not_scale():
    s1 = {"n_rows": 50, "ok_false": 0}
    sN = {"n_rows": 500, "ok_false": 0}
    fails = invariant_fails("bm25_known_item_eval", s1, sN, 10)
    assert fails and "50 -> 500" in fails[0]
    # non-fixed entries may scale freely
    assert invariant_fails("dedup_minhash_lsh", s1, sN, 10) == []


def test_topk_cap_applies_at_both_factors():
    ok = {"n_rows": 20, "ok_false": 0}
    over = {"n_rows": 21, "ok_false": 0}
    assert invariant_fails("basket_part_lift_frac", ok, ok, 10) == []
    assert invariant_fails("basket_part_lift_frac", ok, over, 10)
    assert invariant_fails("basket_part_lift_frac", over, ok, 10)
