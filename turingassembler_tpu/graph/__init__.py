"""Assembly-graph core: data model, construction, condense, invariants, I/O.

Replaces the reference's pointer-based `asm_graph_t` (src/assembly_graph.h:52-95)
with flat numpy arrays (struct-of-arrays) so every pass can be expressed as a
vectorized predicate over edge arrays — the same layout the device kernels use.
"""

from .structs import AsmGraph  # noqa: F401
