"""The Depth Pro network as pure functions over parameter pytrees.

Parameters are nested dicts of jnp arrays in the layouts defined by
``matrix_eyes_tpu.ops.nn``; ``matrix_eyes_tpu.pt.convert`` produces them from
``depth_pro.pt`` checkpoints, and ``init.py`` provides random initialisation
for tests and benchmarks.
"""
