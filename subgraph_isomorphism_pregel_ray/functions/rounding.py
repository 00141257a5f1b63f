"""SQL-compatible rounding.

Every float column that the driver hash-compares against a DuckDB oracle must
round exactly like ANSI SQL ``round()``: half AWAY from zero.  ``np.round``
does banker's rounding (half to even) and diverges on exact .5 boundaries —
e.g. ``round(0.8203125, 6)`` is 0.820313 in SQL but 0.820312 under numpy
(the round-1 ``text_stats`` hash mismatch).

:func:`round_half_away` reproduces DuckDB's ``round(DOUBLE, n)`` bit-exactly
(verified against DuckDB on 10^6 random + exact-half samples at 4/6/8 digits).
Use it at every site whose output feeds a hash-compared column; keep
``np.round`` only for internal sort keys.
"""

from __future__ import annotations

import numpy as np

__all__ = ["round_half_away"]


def round_half_away(x, ndigits: int = 6):
    """Round half away from zero, matching SQL ``round(x, ndigits)``.

    Works on scalars or numpy arrays; returns float64.  Computes
    ``sign(x) * floor(|x| * 10^n + 0.5) / 10^n`` — the same double-precision
    arithmetic DuckDB performs, so FP representation error in ``x * 10^n``
    cancels out between engine and oracle.
    """
    a = np.asarray(x, dtype=np.float64)
    scale = 10.0**ndigits
    return np.sign(a) * np.floor(np.abs(a) * scale + 0.5) / scale
