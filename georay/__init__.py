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
