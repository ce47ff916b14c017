"""One parametrized smoke over EVERY HK_* kernel switch (VERDICT r14
item 8): flip each switch to its non-default arm,
run one representative consumer query on the tiny fixture, and assert
VALUE equality with the default (Arrow-kernel) arm.  The deep
bit-identity pins live in test_assign_kernel / test_sign_kernels /
test_batch_kernels / test_text; this sweep exists so a future refactor
cannot silently break a reference arm those equivalence tests depend
on — a broken switch would otherwise only surface when an A/B is next
attempted.

HK_LLOYD_CKPT is deliberately absent: it is read at module import
(`similarity._LLOYD_CKPT_MODE`), so a runtime flip is a no-op by
design — its cadence A/B runs via fresh processes (kmeans_centroids
docstring).
"""

from __future__ import annotations

import pytest

from healthkit_to_sqlite_spark.registry import queries

SF = "/root/testdata/sf0.001"

#: switch → (reference value, representative consumer query)
SWITCHES = {
    "HK_ASSIGN_KERNEL": ("join", "q_ann_ivf"),
    "HK_LLOYD_MEANS": ("expr", "q_ann_ivf"),
    "HK_RESIDUAL_KERNEL": ("join", "q_ann_ivfpq_residual"),
    "HK_KCENTER_KERNEL": ("scan", "q_kcenter_coreset"),
    "HK_SIGN_KERNEL": ("expr", "q_dedup_embedding"),
    # default is expr (the sf0.1 AND sf1 A/Bs both keep it — SCALE.md
    # r15); the smoke flips to the non-default np twin
    "HK_VERIFY_KERNEL": ("np", "q_dedup_embedding"),
    "HK_MINHASH_KERNEL": ("expr", "q_dedup_minhash_lsh"),
    "HK_SUFFIX_KERNEL": ("join", "q_suffix_ranks"),
    "HK_TRI_KERNEL": ("expr", "q_rare_trigram_rate"),
    "HK_NGRAM_KERNEL": ("expr", "q_ngram_counts"),
    "HK_REPSTATS_KERNEL": ("expr", "q_repetition_signals"),
    "HK_SHINGLE_KERNEL": ("expr", "q_ngram_jaccard"),
    "HK_SIMHASH_KERNEL": ("expr", "q_dedup_simhash"),
    "HK_WINNOW_KERNEL": ("expr", "q_winnowing"),
    "HK_CMS_KERNEL": ("expr", "q_cms_counts"),
    "HK_BPE_KERNEL": ("expr", "q_bpe_encode"),
    "HK_PARA_KERNEL": ("expr", "q_dedup_paragraph"),
}


@pytest.fixture(scope="module")
def qs():
    return queries()


@pytest.mark.parametrize("switch", sorted(SWITCHES))
def test_reference_arm_value_identical(spark, qs, switch, monkeypatch):
    ref_value, qname = SWITCHES[switch]
    for s in SWITCHES:
        monkeypatch.delenv(s, raising=False)
    default_rows = sorted(map(tuple, qs[qname](spark, SF).collect()))
    assert default_rows, f"{qname} returned no rows on the fixture"
    monkeypatch.setenv(switch, ref_value)
    ref_rows = sorted(map(tuple, qs[qname](spark, SF).collect()))
    assert default_rows == ref_rows, (
        f"{switch}={ref_value} arm of {qname} diverged from default")
