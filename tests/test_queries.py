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
        "q_cluster_kmeans", "q_embed_opq", "q_embed_pca",
        "q_embed_pq", "q_embed_whiten", "q_hll_rollup",
        "q_ivf_refresh", "q_sim_eval_ivf", "q_sim_eval_ivfpq",
        "q_sim_eval_lsh", "q_sim_ivf_topk", "q_sim_ivfpq_topk",
        "q_sim_lsh_topk", "q_stream_tdigest", "q_tdigest_quantile",
    ]


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert set(E.oracle_sql()) <= set(E.queries())


def test_approx_distinct_estimate_close_to_exact(spark, sf_dir):
    """Quantitative bound for the rows-only key q_agg_approx_distinct
    (round-15 verdict item 4 — every rows-only key carries a named
    engine-side bound, not just a row count): the HLL++ estimate must
    land within 10% of the exact per-group distinct count on every
    group, at the driver's own sf. The key exposes the comparison as
    its within_10pct column; this test is what makes that column a
    GATE instead of a report."""
    rows = QUERIES["q_agg_approx_distinct"](spark, sf_dir).collect()
    assert len(rows) >= 3  # one per l_returnflag
    for r in rows:
        assert r["exact_parts"] > 0
        assert r["within_10pct"], (
            f"{r['l_returnflag']}: approx {r['approx_parts']} vs "
            f"exact {r['exact_parts']} beyond 10%")


def test_ann_paths_recall(spark):
    """The bucketed ANN paths (LSH, IVF) recover a meaningful share of
    the exact brute-force top-20 — on random synthetic embeddings
    (near-uniform similarity, the hardest case for ANN) deterministic
    recall floors hold."""
    sf = "/root/testdata/sf0.001"
    exact = {(r.v1, r.v2) for r in QUERIES["q_sim_topk"](spark, sf).collect()}
    ivf = {(r.v1, r.v2) for r in QUERIES["q_sim_ivf_topk"](spark, sf).collect()}
    lsh = {(r.v1, r.v2) for r in QUERIES["q_sim_lsh_topk"](spark, sf).collect()}
    ivfpq = {(r.v1, r.v2)
             for r in QUERIES["q_sim_ivfpq_topk"](spark, sf).collect()}
    assert len(exact) == 20
    assert len(exact & ivf) >= 4
    assert len(exact & lsh) >= 2
    # IVFADC+refine: the exact re-rank of the ADC shortlist keeps
    # recall near the IVF ceiling even on adversarial random vectors
    # (measured 19/20 at sf0.001 and sf0.01)
    assert len(exact & ivfpq) >= 12


_HASH_SAFE_TYPES = {"bigint", "int", "smallint", "double", "string", "boolean"}


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_output_types_hash_safe(spark, sf_dir, key):
    """Every ORACLE-CHECKED column is a primitive type that Spark and
    DuckDB stringify identically — decimals, timestamps, and nested
    types never reach the driver's value hash. ROWS-ONLY keys are NOT
    exempt from the shape rule: the driver's rows-only canonicalizer
    still sorts the frame in pandas, and a top-level array/map/struct
    column crashes it (``unhashable type: 'list'`` — the r5 failure
    mode of q_embed_pca/q_embed_whiten). So: oracle keys must be
    hash-safe primitives; rows-only keys must at minimum be free of
    nested types (posexplode arrays to scalar rows — the
    q_feature_scale convention, engine/queries/vectors.py)."""
    df = QUERIES[key](spark, sf_dir)
    if key in ORACLE:
        odd = [(c, t) for c, t in df.dtypes
               if t not in _HASH_SAFE_TYPES]
        assert not odd, f"{key}: non-primitive output columns {odd}"
    else:
        nested = [(c, t) for c, t in df.dtypes
                  if t.startswith(("array<", "map<", "struct<"))]
        assert not nested, (
            f"{key}: nested output columns crash the driver's "
            f"rows-only canonicalizer {nested}")
