"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference library GFleishman/dask_stitch (linear-blend stitching of
blocked 3-D arrays + local-affines-to-field, see
/root/reference/dask_stitch/stitch.py and local_affine.py), widened
into a full relational / streaming / LLM-data-pipeline operator
surface per SURVEY.md §2.

Everything is declared through the DataFrame / Spark SQL API so
Catalyst owns the physical plan; Python kernels exist only behind
Arrow-batched applyInPandas for the blocked-array fast path.
"""
