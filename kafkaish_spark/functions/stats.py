"""Shared statistical constants for the bootstrap family.

ONE home for the Poisson(1) inverse-CDF thresholds so the two
bootstrap plan shapes (composites34's R-column single aggregate and
composites60's constant-fanout explode) can never drift apart on the
literals both engines must compare bit-identically (review r11: two
divergent copies guarded by one test is how a typo ships).
"""

from __future__ import annotations

# P(X <= k) for X ~ Poisson(1), k = 0..6, written as the exact double
# literals both Spark and DuckDB compare a hash-derived uniform
# against.  Pinned against math.exp/factorial by
# tests/test_composites60.py::test_poisson_ladder_mass_is_poisson_one.
POISSON1_CDF = (
    0.36787944117144233,  # k = 0
    0.7357588823428847,   # k = 1
    0.9196986029286058,   # k = 2
    0.9810118431238462,   # k = 3
    0.9963401531726563,   # k = 4
    0.9994058151824183,   # k = 5
    0.9999167588507119,   # k = 6
)
