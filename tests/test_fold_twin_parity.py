"""Fold-twin parity (VERDICT r07 #5 consolidation): the 12 lifecycle
contract entries retired from the driver surface — incremental folds and
layout-only compactions whose DuckDB oracle SQL was VERBATIM their batch
twin's — are pinned HERE instead, by direct value equality against the
surviving twin. This is a strictly stronger check than two independent
oracle rows (fold output must equal batch output row-for-row, not merely
both match the same SQL), so contract consolidation loses no coverage.

Each retired callable still lives in __spark_entry__ (the code paths —
manifest-LSM folds, store compactions — are the production shapes); only
the contract registration moved. RETIRED_FOLD_TWINS maps retired name ->
surviving twin name.
"""

import math
import os

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

# retired contract name -> its callable (kept in __spark_entry__)
RETIRED_CALLABLES = {
    "boilerplate_store_fold": entry._q_boilerplate_store_fold,
    "drift_psi_fold": entry._q_drift_psi_fold,
    "text_kn_fold": entry._q_text_kn_fold,
    "corpus_overlap_store_fold": entry._q_corpus_overlap_store_fold,
    "dedup_cluster_store_merge": entry._q_dedup_cluster_store,
    "decontam_from_store": entry._q_decontam_from_store,
    "decontam_report_fold": entry._q_decontam_report_fold,
    "split_dsir_weights_fold": entry._q_split_dsir_weights_fold,
    "events_holt_fold": entry._q_events_holt_fold,
    "bm25_store_compacted_ranked": entry._q_bm25_store_compacted,
    "sim_ivf_store_compacted_topk": entry._q_sim_ivf_store_compacted,
    "sim_hnsw_compacted_recall": entry._q_sim_hnsw_compacted_recall,
}


def _canon_rows(df):
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted by their string image, floats rounded to 9 significant-ish
    decimals (both twins compute in float64; the fold paths are designed
    bit-identical, but NaN != NaN needs normalizing)."""
    cols = sorted(df.columns)
    out = []
    for row in df.select(*cols).collect():
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else repr(round(v, 9))
            vals.append((c, str(v)))
        out.append(tuple(vals))
    return sorted(out)


def test_retired_map_is_consistent():
    """Every retired name has a callable here and a surviving twin still
    in the contract; no retired name leaked back into the contract."""
    qs = entry.queries()
    assert set(RETIRED_CALLABLES) == set(entry.RETIRED_FOLD_TWINS)
    for retired, survivor in entry.RETIRED_FOLD_TWINS.items():
        assert retired not in qs, retired
        assert survivor in qs, survivor


@pytest.mark.parametrize("retired", sorted(RETIRED_CALLABLES))
def test_fold_twin_matches_batch_twin(spark, retired):
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    survivor = entry.RETIRED_FOLD_TWINS[retired]
    fold_df = RETIRED_CALLABLES[retired](spark, SF_DIR)
    batch_df = entry.queries()[survivor](spark, SF_DIR)
    assert sorted(fold_df.columns) == sorted(batch_df.columns)
    assert _canon_rows(fold_df) == _canon_rows(batch_df), (
        f"{retired} diverged from {survivor}")
