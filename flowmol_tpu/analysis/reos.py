"""REOS structural-alert flags (Glaxo/Dundee SMARTS rule sets).

Parity: /root/reference/flowmol/analysis/reos.py — a per-molecule x per-rule
flag matrix with a sorted canonical header of "<rule_set>::<description>"
names.  Every violated rule is flagged (not just the first match), matching
the reference's `mols_to_flag_arr`, so flag_rate = mean flags per molecule
can exceed 1.

Gated on useful_rdkit_utils (rule tables) + rdkit (SMARTS matching).
"""

from __future__ import annotations

import numpy as np


class REOS:
    def __init__(self, active_rules=("Glaxo", "Dundee")):
        import useful_rdkit_utils as uru  # gated import
        from rdkit import Chem

        self._chem = Chem
        reos = uru.REOS(active_rules=list(active_rules))
        df = reos.get_rule_df()
        # canonical header: sorted "<rule_set>::<description>"
        rows = []
        for _, r in df.iterrows():
            name = f"{r['rule_set_name']}::{r['description']}"
            patt = Chem.MolFromSmarts(r["smarts"])
            if patt is None:
                continue
            rows.append((name, r["smarts"], patt,
                         int(r.get("max", 0))))
        rows.sort(key=lambda x: x[0])
        self.flag_arr_header = [r[0] for r in rows]
        self.smarts_arr = [r[1] for r in rows]
        self._patterns = [(r[2], r[3]) for r in rows]

    def mols_to_flag_arr(self, mols) -> np.ndarray:
        """(n_mols, n_rules) 0/1 matrix: 1 where the molecule exceeds the
        rule's allowed substructure count."""
        out = np.zeros((len(mols), len(self._patterns)), np.int64)
        for i, mol in enumerate(mols):
            for j, (patt, max_allowed) in enumerate(self._patterns):
                n = len(mol.GetSubstructMatches(patt, maxMatches=max_allowed + 1))
                if n > max_allowed:
                    out[i, j] = 1
        return out


def build_reos_df(flag_arr: np.ndarray, flag_names):
    import pandas as pd
    rates = flag_arr.mean(0)
    return pd.DataFrame({"flag": flag_names, "flag_rate": rates}).set_index(
        "flag")
