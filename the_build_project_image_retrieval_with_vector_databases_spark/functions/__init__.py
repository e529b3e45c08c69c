"""Column-expression library: vector math and text primitives.

All functions here return Catalyst ``Column`` expressions (JVM-side,
whole-stage-codegen'd) — no Python UDFs. This is the engine's replacement
for the reference's NumPy/FAISS kernels (SURVEY §2.2, §4.3.1).
"""

from .vector import (  # noqa: F401
    cosine_sim,
    dot,
    l2_dist,
    l2_dist_sq,
    l2_norm,
    l2_normalize,
    to_double_array,
)
from .text import (  # noqa: F401
    char_ngrams,
    hex_prefix_to_long,
    token_shingles,
    tokens,
)
