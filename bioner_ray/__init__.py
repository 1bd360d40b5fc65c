"""bioner_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch engine with the query/data-processing capabilities of
phil1995/BioNER (reference at /root/reference, cited by file:line in
docstrings), re-expressed as idiomatic Ray Data pipelines:
``ray.data.Dataset`` → ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful stages (model scoring, entity linking),
``groupby``/``sort`` for the wide steps, streaming execution throughout.

Never calls ``ray.init()``/``ray.shutdown()`` — sessions are owned by the
caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.1.0"
