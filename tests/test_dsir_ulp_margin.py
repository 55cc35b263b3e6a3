"""q_dsir_weight quantizes ln-ratios to a 1e-6 grid before the
per-document integer sum. The ln itself is evaluated independently by
Spark/JVM and DuckDB (libm is engine-specific and IEEE does not
require a correctly-rounded ln), so a 1-ulp divergence could flip the
floor if a grid value sat exactly on a boundary (round-7 ADVICE.md).

This test MEASURES the accepted boundary risk: for every fixture
scale it recomputes the 64 exact integer count ratios, evaluates the
pre-floor grid value v = ln(ratio)·1e6 − 0.5, and pins the distance
of each v from its nearest integer boundary at > 1e-4.

Error budget: the ratio operands (ct+1)(tr+64) and (cr+1)(tt+64) are
exact in double below 2^53; the division contributes ≤0.5 ulp
(~1.1e-16 relative); a non-correctly-rounded ln adds ≤~2 ulp
(~4.4e-16 relative on ln's argument, ≤1e-15 absolute for
|ln r| ≤ 10). Scaled by 1e6, the worst cross-engine perturbation of
v is ≲1e-9 — the pinned 1e-4 margin is ≥10^5× that, so the
quantization cannot flip between engines on these fixtures.
"""
import math
import os

import duckdb
import pytest

DIM = 64  # engine.queries.pipeline._DSIR_DIM
SFS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1")
       if os.path.exists(os.path.join(d, "documents.parquet"))]

HEX32 = " + ".join(
    f"CAST(instr('0123456789abcdef', substr(h, {i}, 1)) - 1 AS BIGINT)"
    f" * {16 ** (8 - i)}" for i in range(1, 9))


@pytest.mark.parametrize("sf", SFS)
def test_grid_values_clear_floor_boundaries(sf):
    doc = os.path.join(sf, "documents.parquet")
    rows = duckdb.sql(f"""
        WITH tok AS (
          SELECT doc_id, CAST(({HEX32}) % {DIM} AS BIGINT) AS bucket
          FROM (SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
                FROM read_parquet('{doc}') WHERE length(text) > 0)),
        cnt AS (
          SELECT b.bucket,
                 coalesce(t.ct, 0) AS ct, coalesce(r.cr, 0) AS cr
          FROM (SELECT unnest(generate_series(0, {DIM - 1})) AS bucket) b
          LEFT JOIN (SELECT bucket, count(*) AS ct FROM tok
                     WHERE doc_id % 97 = 0 GROUP BY bucket) t USING (bucket)
          LEFT JOIN (SELECT bucket, count(*) AS cr FROM tok
                     WHERE doc_id % 97 <> 0 GROUP BY bucket) r USING (bucket))
        SELECT ct, cr, (SELECT sum(ct) FROM cnt) AS tt,
               (SELECT sum(cr) FROM cnt) AS tr
        FROM cnt ORDER BY bucket
    """).fetchall()
    assert len(rows) == DIM
    margins = []
    for ct, cr, tt, tr in rows:
        num, den = (ct + 1.0) * (tr + DIM), (cr + 1.0) * (tt + DIM)
        assert num < 2 ** 53 and den < 2 ** 53  # operands exact in double
        v = math.log(num / den) * 1e6 - 0.5  # the pre-floor grid value
        margins.append(abs(v - round(v)))
    assert min(margins) > 1e-4, (
        f"{sf}: a DSIR grid value sits {min(margins):.3e} from a floor "
        f"boundary — within reach of cross-libm ln divergence; "
        f"re-derive the quantization for this fixture")
