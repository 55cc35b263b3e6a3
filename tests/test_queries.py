"""Every registered query runs at sf0.001 with a stable schema and a
sane row count. Full value-level verification against DuckDB is
check.py (the driver-gate mirror); this is the fast regression net.
"""
import pytest

from engine.registry import ORACLE, QUERIES, load_all

load_all()

# keys whose result is legitimately tiny or fixture-bound
_MIN_ROWS = {k: 0 for k in ["q_dedup_fuzzy_minhash", "q_dedup_ngram_jaccard",
                            "q_join_anti", "q_agg_having"]}


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_query_runs(spark, sf_dir, key):
    df = QUERIES[key](spark, sf_dir)
    assert df.columns, f"{key}: empty schema"
    assert len(df.columns) == len(set(df.columns)), f"{key}: duplicate columns"
    rows = df.limit(1000000).collect()
    assert len(rows) >= _MIN_ROWS.get(key, 1), f"{key}: empty result"


def test_every_key_has_oracle_or_reason():
    no_oracle = sorted(set(QUERIES) - set(ORACLE))
    # rows-only keys must be a deliberate, short list
    # every remaining rows-only key is an approximate/sketch/ANN path
    # whose internals are engine-specific by design
    assert no_oracle == [
        "q_agg_approx_distinct", "q_agg_approx_quantile",
        "q_cluster_kmeans", "q_embed_pca", "q_embed_whiten",
        "q_hll_rollup", "q_sim_ivf_topk", "q_sim_lsh_topk",
    ]


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert set(E.oracle_sql()) <= set(E.queries())


def test_ann_paths_recall(spark):
    """The bucketed ANN paths (LSH, IVF) recover a meaningful share of
    the exact brute-force top-20 — on random synthetic embeddings
    (near-uniform similarity, the hardest case for ANN) deterministic
    recall floors hold."""
    sf = "/root/testdata/sf0.001"
    exact = {(r.v1, r.v2) for r in QUERIES["q_sim_topk"](spark, sf).collect()}
    ivf = {(r.v1, r.v2) for r in QUERIES["q_sim_ivf_topk"](spark, sf).collect()}
    lsh = {(r.v1, r.v2) for r in QUERIES["q_sim_lsh_topk"](spark, sf).collect()}
    assert len(exact) == 20
    assert len(exact & ivf) >= 4
    assert len(exact & lsh) >= 2


_HASH_SAFE_TYPES = {"bigint", "int", "smallint", "double", "string", "boolean"}


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_output_types_hash_safe(spark, sf_dir, key):
    """Every ORACLE-CHECKED column is a primitive type that Spark and
    DuckDB stringify identically — decimals, timestamps, and nested
    types never reach the driver's value hash. Rows-only keys (no
    oracle; the driver only counts rows) may carry arrays — e.g.
    q_embed_pca's projection vector."""
    if key not in ORACLE:
        pytest.skip("rows-only key: never value-hashed")
    df = QUERIES[key](spark, sf_dir)
    odd = [(c, t) for c, t in df.dtypes if t not in _HASH_SAFE_TYPES]
    assert not odd, f"{key}: non-primitive output columns {odd}"
