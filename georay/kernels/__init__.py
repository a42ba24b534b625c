"""Vectorized batch kernels (numpy over flat coord buffers + offsets).

Each kernel mirrors a reference algorithm's exact semantics (cited per
function) and is shaped for ``Dataset.map_batches(fn,
batch_format="pyarrow")``: array in, array out, no Python-object
geometries in the hot path.
"""
