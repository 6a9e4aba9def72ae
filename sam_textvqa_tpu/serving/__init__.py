"""Online serving: dynamic-batching inference engine over the incremental
greedy decoder (models/fast_decode.py).

The reference repo has no serving layer (its eval path is offline batch
scoring, reference evaluator.py:52-63); this subsystem is the production
analogue: requests arrive one at a time, are coalesced into fixed-shape
batches from a small set of pre-compiled bucket sizes, decoded on device,
and answered as strings — all without ever presenting XLA a new shape.
"""

from .engine import ServingEngine, ServingStats, build_sample  # noqa: F401
