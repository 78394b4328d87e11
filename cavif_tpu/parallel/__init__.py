"""Parallel runtime: batch (data) parallelism + device-mesh helpers.

Maps the reference's three parallelism levels (SURVEY.md section 2.4) to
this framework: rayon par_iter over files -> encode_batch thread pool;
rayon::join color/alpha -> back-to-back device programs in pipeline.py;
rav1e tile threads -> parallel native tile encodes (av1/encoder.py) plus
the (data, tile) device mesh sharding in ops/block_search.py.
"""

from .batch import BatchResult, encode_batch, plane_mode_search_batch

__all__ = ["BatchResult", "encode_batch", "plane_mode_search_batch"]
