"""fast_carpenter_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-imagining of FAST-HEP/fast-carpenter's YAML-driven stage
pipeline (Define -> CutFlow -> BinnedDataframe; see
/root/reference/fast_carpenter/__main__.py:66-84) as a DAG of vectorized
spatial stages over tables of interleaved text+media documents:

* ``grid``        — hierarchical cell index (H3/S2-style, from scratch),
                    Hilbert keys for range partitioning
* ``synth``       — deterministic synthetic inputs (spans / polygons /
                    raster tiles) derived from the driver `documents` table
* ``expressions`` — numexpr-dialect -> Spark SQL transpiler
                    (ref: fast_carpenter/expressions.py)
* ``operators``   — Define / CutFlow / BinnedDataframe(TileAgg) /
                    SystematicWeights / skim stages
* ``spatial``     — point-in-polygon cutflow, spatial join, kNN,
                    raster<->vector join
* ``functions``   — large-scale training-data ops: dedup (exact, MinHash-LSH,
                    SimHash, n-gram Jaccard), ANN similarity search, text
                    quality / langid / tokens, multimodal stubs
* ``sources``     — Iceberg-style snapshot reader (parquet + JSON manifest)
* ``plans``       — config-driven pipeline (stage sequence -> one DataFrame)

Everything is whole-column: DataFrame built-ins on the hot path, Arrow-batched
pandas UDFs where Spark lacks an operator, never per-row Python.
"""

__version__ = "0.1.0"

from . import grid, synth, expressions  # noqa: F401
