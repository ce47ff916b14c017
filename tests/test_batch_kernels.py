"""The r14 second-wave Arrow kernels must be VALUE-IDENTICAL to their
expression forms (the `test_sign_kernels` discipline applied to the
remaining interpreted-HOF / per-element-md5 hot paths):

- word shingles (`_word_shingles_np`): pure string arithmetic —
  Python ``text.split(" ")`` == Spark ``split(text, ' ')`` including
  empty-token runs, first-occurrence distinct == ``array_distinct``,
  short-doc truncated shingle == the ``greatest(.., 1)`` floor.
- SimHash (`_simhash_np`): integer-only (md5 → top-15-hex parse →
  signed per-bit counts → strict ``> 0`` majority) — no IEEE story.
- winnowing grams (`_winnow_grams_np`): integer-only (md5 → top-8-hex
  parse), same rows as the posexplode form.
- Count-Min partials (`_cms_partials_np`): exact integer partial
  counts that SUM to the same d×w matrix at any batch boundary.

Each suite runs both kernels explicitly at two fixture scales (Arrow
batch boundaries move) plus a constructed edge set, and pins the
map-only plan property the kernels were built for.
"""

from __future__ import annotations

import pytest

from healthkit_to_sqlite_spark.catalog import load_table
from healthkit_to_sqlite_spark.operators.dedup import (
    _simhash_np,
    _word_shingles_np,
    simhash,
    word_shingles,
)
from healthkit_to_sqlite_spark.operators.pipeline import (
    _cms_partials_np,
    cms_sketch,
)
from healthkit_to_sqlite_spark.operators.text import _winnow_select
from healthkit_to_sqlite_spark.plans import formatted_plan

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _edge_docs(spark):
    # the shared tokenizer edge set: short docs (truncated shingle /
    # no gram), space runs → empty tokens, null text → no rows,
    # repeated tokens (SimHash weights, distinct dedup), non-ASCII
    return spark.createDataFrame(
        [(0, "a b a b a"), (1, "x"), (2, "a  b"), (3, None),
         (4, "héllo wörld héllo wörld"), (5, " lead"), (6, "trail "),
         (7, ""), (8, "w x y z w x y z w x y z")],
        "doc_id bigint, text string")


@pytest.mark.parametrize("sf", SCALES)
@pytest.mark.parametrize("k", [2, 4])
def test_word_shingles_np_value_identical(spark, monkeypatch, sf, k):
    docs = load_table(spark, sf, "documents")
    monkeypatch.setenv("HK_SHINGLE_KERNEL", "expr")
    a = sorted(map(tuple, word_shingles(docs, k=k).collect()))
    b = sorted(map(tuple, _word_shingles_np(docs, k=k).collect()))
    assert a == b
    assert len(a) > 0


@pytest.mark.parametrize("k", [2, 4])
def test_word_shingles_np_edge_set(spark, monkeypatch, k):
    # k parametrized (ADVICE r14): the k=2 path hits a different
    # greatest(.., 1) truncation boundary than the default k=4
    docs = _edge_docs(spark)
    monkeypatch.setenv("HK_SHINGLE_KERNEL", "expr")
    a = sorted(map(tuple, word_shingles(docs, k=k).collect()))
    b = sorted(map(tuple, _word_shingles_np(docs, k=k).collect()))
    assert a == b
    # the conventions the kernel must reproduce, pinned explicitly:
    got = dict()
    for did, sh in a:
        got.setdefault(did, []).append(sh)
    if k == 4:
        assert got[1] == ["x"]        # <k tokens → one truncated shingle
        assert got[2] == ["a  b"]     # empty token BETWEEN words kept
    else:
        assert got[1] == ["x"]        # 1 token < k=2 → truncated
        assert got[2] == [" b", "a "]  # 3 tokens → two 2-shingles (sorted)
    assert got[3] == [""]             # null text → concat_ws-swallowed ""
    assert got[7] == [""]             # empty text → [""] token → "" shingle


@pytest.mark.parametrize("sf", SCALES)
def test_simhash_np_value_identical(spark, monkeypatch, sf):
    docs = load_table(spark, sf, "documents")
    monkeypatch.setenv("HK_SIMHASH_KERNEL", "expr")
    a = sorted(map(tuple, simhash(docs).collect()))
    b = sorted(map(tuple, _simhash_np(docs).collect()))
    assert a == b
    assert len(a) == docs.count()


def test_simhash_np_edge_set(spark, monkeypatch):
    docs = _edge_docs(spark)
    monkeypatch.setenv("HK_SIMHASH_KERNEL", "expr")
    a = sorted(map(tuple, simhash(docs).collect()))
    b = sorted(map(tuple, _simhash_np(docs).collect()))
    assert a == b
    ids = {r[0] for r in a}
    assert 3 not in ids and 7 in ids  # null drops; "" hashes the empty tok


@pytest.mark.parametrize("sf", SCALES)
def test_winnow_grams_np_value_identical(spark, monkeypatch, sf):
    docs = load_table(spark, sf, "documents")
    monkeypatch.setenv("HK_WINNOW_KERNEL", "expr")
    a = sorted(map(tuple, _winnow_select(docs).collect()))
    monkeypatch.setenv("HK_WINNOW_KERNEL", "np")
    b = sorted(map(tuple, _winnow_select(docs).collect()))
    assert a == b
    assert len(a) > 0


def test_winnow_grams_np_edge_set(spark, monkeypatch):
    # w=1 keeps every gram (no window selection) so the GRAM BUILD
    # itself is compared 1:1; the empty-token filter and the <k-token
    # drop are the conventions under test
    docs = _edge_docs(spark)
    monkeypatch.setenv("HK_WINNOW_KERNEL", "expr")
    a = sorted(map(tuple, _winnow_select(docs, w=1).collect()))
    monkeypatch.setenv("HK_WINNOW_KERNEL", "np")
    b = sorted(map(tuple, _winnow_select(docs, w=1).collect()))
    assert a == b
    ids = {r[0] for r in a}
    assert 1 not in ids and 7 not in ids      # <k tokens → no grams
    assert 2 not in ids                       # empties dropped → 2 toks < k
    assert 0 in ids and 8 in ids


@pytest.mark.parametrize("sf", SCALES)
def test_cms_partials_np_value_identical(spark, monkeypatch, sf):
    docs = load_table(spark, sf, "documents")
    monkeypatch.setenv("HK_CMS_KERNEL", "expr")
    a = sorted(map(tuple, cms_sketch(docs).collect()))
    monkeypatch.setenv("HK_CMS_KERNEL", "np")
    b = sorted(map(tuple, cms_sketch(docs).collect()))
    assert a == b
    assert sum(r[2] for r in a) == sum(r[2] for r in b)


def test_cms_partials_np_edge_set(spark, monkeypatch):
    docs = _edge_docs(spark)
    monkeypatch.setenv("HK_CMS_KERNEL", "expr")
    a = sorted(map(tuple, cms_sketch(docs).collect()))
    monkeypatch.setenv("HK_CMS_KERNEL", "np")
    b = sorted(map(tuple, cms_sketch(docs).collect()))
    assert a == b
    # total mass = d × token occurrences (null drops, empties count)
    n_toks = sum(len(t.split(" ")) for _, t in
                 [(0, "a b a b a"), (1, "x"), (2, "a  b"),
                  (4, "héllo wörld héllo wörld"), (5, " lead"),
                  (6, "trail "), (7, ""), (8, "w x y z w x y z w x y z")])
    assert sum(r[2] for r in a) == 4 * n_toks


@pytest.mark.parametrize("sf", SCALES)
@pytest.mark.parametrize("wpp", [3, 16])
def test_paragraphs_np_value_identical(spark, monkeypatch, sf, wpp):
    from healthkit_to_sqlite_spark.operators.dedup import (
        _paragraphs_np,
        paragraphs,
    )

    docs = load_table(spark, sf, "documents")
    monkeypatch.setenv("HK_PARA_KERNEL", "expr")
    a = sorted(map(tuple, paragraphs(docs, wpp).collect()))
    b = sorted(map(tuple, _paragraphs_np(docs, wpp).collect()))
    assert a == b
    assert len(a) > 0


def test_paragraphs_np_edge_set(spark, monkeypatch):
    from healthkit_to_sqlite_spark.operators.dedup import (
        _paragraphs_np,
        paragraphs,
    )

    docs = _edge_docs(spark)
    monkeypatch.setenv("HK_PARA_KERNEL", "expr")
    a = sorted(map(tuple, paragraphs(docs, 4).collect()))
    b = sorted(map(tuple, _paragraphs_np(docs, 4).collect()))
    assert a == b
    got = {}
    for did, idx, t in a:
        got.setdefault(did, []).append(t)
    assert got[1] == ["x"]               # short doc → one short para
    assert 3 not in got                  # null text → no rows
    assert got[7] == [""]                # empty text → one "" para
    assert got[8] == ["w x y z"] * 3     # exact multiple → full paras
    assert got[0] == ["a b a b", "a"]    # remainder tail para


@pytest.mark.parametrize("sf", SCALES)
def test_bpe_apply_np_value_identical(spark, monkeypatch, sf):
    from healthkit_to_sqlite_spark.operators.text import bpe_apply

    docs = load_table(spark, sf, "documents")
    # a hand model exercising rank order, the odd-self-run straggler
    # (aaa → aa a), and merges that only fire after earlier merges
    model = [("e", "r"), ("a", "a"), ("aa", "a"), ("t", "h"),
             ("th", "er")]
    monkeypatch.setenv("HK_BPE_KERNEL", "expr")
    a = sorted(map(tuple, bpe_apply(docs, model).collect()))
    monkeypatch.setenv("HK_BPE_KERNEL", "np")
    b = sorted(map(tuple, bpe_apply(docs, model).collect()))
    assert a == b
    assert len(a) > 0


def test_bpe_apply_np_edge_set(spark, monkeypatch):
    from healthkit_to_sqlite_spark.operators.text import bpe_apply

    docs = _edge_docs(spark)
    model = [("a", "b"), ("ab", "a"), ("w", "x"), ("y", "z"),
             ("wx", "yz")]
    monkeypatch.setenv("HK_BPE_KERNEL", "expr")
    a = sorted(map(tuple, bpe_apply(docs, model).collect()))
    monkeypatch.setenv("HK_BPE_KERNEL", "np")
    b = sorted(map(tuple, bpe_apply(docs, model).collect()))
    assert a == b
    ids = {r[0] for r in a}
    assert 3 not in ids and 7 not in ids  # null/empty text → no words


def test_batch_kernels_defaults_and_map_only(spark, monkeypatch):
    # default = np (MapInPandas in the plan), expr selectable; and the
    # shingle/simhash/cms builds stay exchange-free — the map-only
    # property the kernels were built for (the winnow gram build's
    # exchange budget is owned by the downstream window, pinned via
    # the full _winnow_select plan in test_plans)
    from healthkit_to_sqlite_spark.operators.text import bpe_apply

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for env in ("HK_SHINGLE_KERNEL", "HK_SIMHASH_KERNEL",
                "HK_WINNOW_KERNEL", "HK_CMS_KERNEL", "HK_BPE_KERNEL"):
        monkeypatch.delenv(env, raising=False)
    assert "MapInPandas" in formatted_plan(word_shingles(docs))
    assert "Exchange" not in formatted_plan(word_shingles(docs))
    sim_plan = formatted_plan(simhash(docs))
    assert "MapInPandas" in sim_plan and "Exchange" not in sim_plan
    cms_plan = formatted_plan(cms_sketch(docs))
    assert "MapInPandas" in cms_plan
    bpe_plan = formatted_plan(bpe_apply(docs, [("a", "b")]))
    assert "MapInPandas" in bpe_plan and "Exchange" not in bpe_plan
    for env in ("HK_SHINGLE_KERNEL", "HK_SIMHASH_KERNEL",
                "HK_CMS_KERNEL", "HK_BPE_KERNEL"):
        monkeypatch.setenv(env, "expr")
    assert "MapInPandas" not in formatted_plan(word_shingles(docs))
    assert "MapInPandas" not in formatted_plan(simhash(docs))
    assert "MapInPandas" not in formatted_plan(cms_sketch(docs))
    assert "MapInPandas" not in formatted_plan(bpe_apply(docs,
                                                         [("a", "b")]))
