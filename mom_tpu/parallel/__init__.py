"""Multi-chip scaling: data parallelism over views (data_parallel) and
tensor parallelism over the point axis with image row-sharded compositing
(point_sharded)."""
