"""REOS structural-alert flags (Glaxo/Dundee SMARTS rule sets).

Parity: /root/reference/flowmol/analysis/reos.py — a thin wrapper around
useful_rdkit_utils.REOS producing a per-molecule flag matrix with a sorted
canonical header.  Gated on useful_rdkit_utils/rdkit availability.
"""

from __future__ import annotations

import numpy as np


class REOS:
    def __init__(self, active_rules=("Glaxo", "Dundee")):
        import useful_rdkit_utils as uru  # gated import
        self.reos = uru.REOS(active_rules=list(active_rules))
        df = self.reos.get_rule_df()
        names = sorted(df["description"].tolist())
        self.flag_arr_header = names
        self.smarts_arr = df["smarts"].tolist()
        self._name_to_col = {n: i for i, n in enumerate(names)}

    def mols_to_flag_arr(self, mols) -> np.ndarray:
        out = np.zeros((len(mols), len(self.flag_arr_header)), np.int64)
        for i, mol in enumerate(mols):
            rule_set, desc = self.reos.process_mol(mol)
            if rule_set != "ok" and desc in self._name_to_col:
                out[i, self._name_to_col[desc]] = 1
        return out


def build_reos_df(flag_arr: np.ndarray, flag_names):
    import pandas as pd
    rates = flag_arr.mean(0)
    return pd.DataFrame({"flag": flag_names, "flag_rate": rates}).set_index(
        "flag")
