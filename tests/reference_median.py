"""Test oracle: a minimal pure-Python implementation of the reference's
interpolated-median algorithm (behavioral spec from
/root/reference/factfinder/median.py:7-197), used only to check the
Spark expression implementation on arbitrary inputs.  Written
independently against the documented semantics in SURVEY.md §2.6 F10,
including the quirks (python -1 wraparound in upper-bound C1, the
bitwise-& chained comparison, hard-coded ordered[1] bound edge)."""

from __future__ import annotations

import math

NAN = float("nan")


def _first_index(seq, pred):
    for i, v in enumerate(seq):
        if pred(v):
            return i
    return None


def median_and_moe(
    counts: list[float],
    bounds: list[tuple[float, float]],
    design_factor: float,
    top_coding: bool,
    bottom_coding: bool,
    is_mdrms: bool = False,
):
    """Return (median, moe); NaN stands for the reference's np.nan."""
    n = len(counts)
    lo = [b[0] for b in bounds]
    hi = [b[1] for b in bounds]

    cum = []
    s = 0.0
    for c in counts:
        s += c
        cum.append(s)
    B = cum[-1] if cum else 0.0

    # ---- median: first bin whose cumulative count reaches B/2 -------
    if B == 0:
        median = NAN
    else:
        med_i = _first_index(cum, lambda c: c >= B / 2)
        if med_i == 0 and bottom_coding:
            median = hi[0]
        elif cum[med_i] == 0.0:
            median = NAN
        elif med_i == n - 1 and top_coding:
            median = lo[n - 1]
        else:
            c_prev = cum[med_i] - counts[med_i]
            width = hi[med_i] - lo[med_i]
            median = lo[med_i] + (B / 2 - c_prev) * width / counts[med_i]

    # ---- MOE --------------------------------------------------------
    if B == 0:
        return median, NAN
    se_50 = design_factor * math.sqrt(93.0 / (7.0 * B) * 2500.0)
    p_lower, p_upper = 50 - se_50, 50 + se_50
    cumpct = [c / B * 100 for c in cum]
    lower_bin = _first_index(cumpct, lambda c: c > p_lower)
    upper_bin = _first_index(cumpct, lambda c: c > p_upper)
    fnz = _first_index(cumpct, lambda c: c != 0)

    def get_bound(p, a1, a2, c1, c2):
        if ((c2 - c1) + a1) != 0:
            if c2 - c1 == 0:
                return NAN  # spark try_divide → NULL (ref: ±inf)
            return (p - c1) * (a2 - a1) / (c2 - c1) + a1
        return NAN

    def lower_bound():
        a1 = lo[lower_bin]
        a2 = lo[lower_bin + 1] if lower_bin + 1 <= n - 1 else NAN
        c1 = 0.0 if lower_bin == 0 else cumpct[lower_bin - 1]
        c2 = cumpct[lower_bin]
        if lower_bin == fnz:
            a1 = 0.5 if is_mdrms else 0.0
            a2 = lo[1] if n > 1 else NAN
        return get_bound(p_lower, a1, a2, c1, c2)

    def upper_bound():
        a1 = lo[upper_bin]
        a2 = lo[upper_bin + 1] if upper_bin + 1 <= n - 1 else NAN
        c1 = cumpct[upper_bin - 1]  # python wraparound at index -1
        c2 = cumpct[upper_bin]
        if upper_bin == n - 1:
            a1 = lo[n - 1]
            a2 = a1
        band = lower_bin & upper_bin
        if upper_bin == band and band == fnz:
            a1 = 0.0
            a2 = lo[1] if n > 1 else NAN
        return get_bound(p_upper, a1, a2, c1, c2)

    if not math.isnan(median) and median >= lo[n - 1]:
        moe = NAN
    elif se_50 >= 50:
        moe = NAN
    elif lower_bin is not None and lower_bin >= n - 1:
        moe = NAN
    elif lower_bin is None or upper_bin is None:
        moe = NAN
    else:
        moe = (upper_bound() - lower_bound()) * 1.645 / 2
    return median, moe
