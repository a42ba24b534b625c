"""georay — a Ray-Data-native spatial-join + tiling engine.

Brand-new engine with the algorithm surface of georust/geo (reference at
/root/reference, studied for semantics only), re-expressed as vectorized
``map_batches`` kernels over zero-copy Arrow batches, actor pools for
stateful stages (prepared polygon indexes, kNN trees), and explicit
groupby/shuffle plans for the wide steps (cell-index spatial join, kNN,
tiling).

Layout:
    georay.rng        deterministic splitmix64 streams (numpy + SQL emitters)
    georay.imagecodec tiny PNG encoder/decoder + deterministic fake-JPEG codec
    georay.datagen    seeded synthetic image table + polygon layer (input_hint)
    georay.cells      uint64 quad-cell (z-order) spatial index encoding
    georay.kernels.*  vectorized batch kernels (PiP, measures, summaries, ...)
    georay.index      per-worker grid index over a prepared polygon layer
    georay.oracle     scalar loop-based reference (conformance authority)
    georay.join       broadcast / cell-shuffle spatial join with salting
    georay.knn        kNN via cell-ring candidates + per-partition refine
    georay.tiles      raster<->vector tile assignment
    georay.lineage    per-partition lineage records + resume
    georay.pipelines  end-to-end Dataset pipelines
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("GEORAY_ARROW_SINGLE_THREAD") == "1":
    # honest per-CPU accounting for scaling benchmarks: pyarrow's
    # internal pools default to ALL hardware threads, letting a
    # "4-CPU" Ray session decompress parquet on 32 cores — which
    # inflates low-parallelism throughput and corrupts the N->4N
    # efficiency measurement.  Workers import georay, so this caps them.
    import pyarrow as _pa

    _pa.set_cpu_count(1)
    _pa.set_io_thread_count(1)
