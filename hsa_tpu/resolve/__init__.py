"""Hit resolution and output layer (reference L4: ``bwase.c`` / ``bwape.c``).

Engine-agnostic: consumes per-read hit lists (from the beam engine or the
oracle — both produce the identical hit-set contract), resolves them to SAM
records.  Because the resolution code is shared, search-engine parity
propagates to record parity by construction.
"""

from .samse import resolve_batch_se, AlnRecord  # noqa: F401
