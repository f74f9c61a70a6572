"""Shared similarity-threshold constants, registration-free.

Lives outside dedup.py so modules that need the SAME shingle/threshold
configuration (mining.py's prefix join, pipeline.py) can import it
WITHOUT triggering dedup's query registrations — the registry import
order in plans/__init__.py is load-bearing for the driver's sampling
budget, and a cross-module constant import must not reorder it.
"""

SHINGLE_K = 5
JACCARD_THRESHOLD = 0.7
