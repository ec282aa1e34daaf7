"""Single-end mapping quality (lineage: ``bwase.c:bwa_approx_mapQ``).

c1 = number of distinct (position, strand) occurrences at the best score,
c2 = number within the score window above best (see SURVEY.md A.5).  Both
are clamped at 256 (beyond that MAPQ is pinned anyway).  This is the
documented lineage formula; re-verify against the mount when available.
"""

from __future__ import annotations

import math


def g_log_n(n: int) -> int:
    return int(4.343 * math.log(n) + 0.5) if n > 0 else 0


def approx_mapq(c1: int, c2: int, nmm: int, max_diff: int) -> int:
    if c1 == 0:
        return 23
    if c1 > 1:
        return 0
    if nmm == max_diff:
        return 25
    if c2 == 0:
        return 37
    n = min(c2, 255)
    q = 23 - g_log_n(n)
    return max(q, 0)
