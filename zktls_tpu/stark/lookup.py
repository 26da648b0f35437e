"""LogUp (log-derivative lookup) witness helpers.

The multiset argument that glues chips together and proves table
memberships — the framework analogue of the reference's LogUp-style
lookup/permutation arguments between sp1-core-machine chips
(SURVEY.md §2.2.B).  Identity proven, for a lookup challenge γ:

    Σ_rows 1/(γ − v_i)  =  Σ_rows m_i/(γ − t_i)

which holds (whp over γ) iff the multiset {v_i} is covered by table values
{t_i} with multiplicities m_i.  The prover commits, per lookup:

    inv_v = 1/(γ − v),  inv_t = 1/(γ − t),  S = running sum of
    (inv_v − m·inv_t), with S_last = 0 (or a public cumulative value that
    cross-chip bundles sum to zero).

All three are extension elements → 12 base columns per lookup.
"""

from __future__ import annotations

import numpy as np

from ..ops.field_ref import Fp4, P

__all__ = ["fp4_batch_inverse", "logup_perm_columns", "PERM_COLS_PER_LOOKUP"]

PERM_COLS_PER_LOOKUP = 12  # inv_v (4) ‖ inv_t (4) ‖ S (4)


def fp4_batch_inverse(vals: list[Fp4]) -> list[Fp4]:
    """Montgomery batch inversion over Fp4 (one inversion + 3(n−1) mults)."""
    n = len(vals)
    prefix = [Fp4(1)] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v
    inv_all = prefix[n].inv()
    out: list[Fp4] = [Fp4(0)] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all
        inv_all = inv_all * vals[i]
    return out


def logup_perm_columns(values, table, mults, gamma: Fp4) -> np.ndarray:
    """Build the 12 permutation columns for one lookup.

    values/table/mults: length-n integer sequences (the main-trace value
    column, the table column as materialized per row, the multiplicity
    column).  Returns plain uint32 (n, 12)."""
    n = len(values)
    gv = [gamma - int(v) for v in values]
    gt = [gamma - int(t) for t in table]
    inv_v = fp4_batch_inverse(gv)
    inv_t = fp4_batch_inverse(gt)
    out = np.zeros((n, PERM_COLS_PER_LOOKUP), dtype=np.uint32)
    run = Fp4(0)
    for i in range(n):
        term = inv_v[i] - int(mults[i]) * inv_t[i]
        run = run + term
        out[i, 0:4] = inv_v[i].c
        out[i, 4:8] = inv_t[i].c
        out[i, 8:12] = run.c
    return out
