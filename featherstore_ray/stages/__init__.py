"""Batch-transform stages (the operator library).

Each module exposes functions of the form ``fn(ds: ray.data.Dataset, ...)
-> ray.data.Dataset`` composed of narrow ``map_batches`` maps plus at most
one entity-bucket shuffle (see ``featherstore_ray.partition``).
"""
