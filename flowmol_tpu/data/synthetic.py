"""Synthetic molecule dataset generator.

The container has neither the raw GEOM/QM9 data nor RDKit, so for tests,
smoke training and benchmarking we generate connected, valence-consistent
fake molecules: sizes drawn from the real dataset histograms (assets/data/*),
a carbon-dominated heavy-atom skeleton laid out along the bond tree with
~1.45 A steps, hydrogens filling leftover valence.  The storage format and
every downstream code path (batching, priors, training, sampling, analysis)
are identical to real data.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from flowmol_tpu.data.dataset import save_packed
from flowmol_tpu.data.stats import (MarginalDists, NAtomsDistribution,
                                    compute_marginals)


# typical max valences for the default qm9-like atom map order
_DEFAULT_VALENCES = {"C": 4, "H": 1, "N": 3, "O": 2, "F": 1, "P": 3, "S": 2,
                     "Cl": 1, "Br": 1, "I": 1}


def generate_molecule(rng: np.random.Generator, n: int, n_atom_types: int,
                      n_bond_types: int = 4,
                      atom_map=("C", "H", "N", "O", "F")):
    """One connected, valence-consistent fake molecule.

    Bonds are assigned subject to per-element maximum valences so a model
    trained on this data has learnable local structure (atom stability /
    connectivity are achievable, unlike fully random graphs)."""
    atom_map = list(atom_map)[:n_atom_types]
    while len(atom_map) < n_atom_types:
        atom_map.append("C")
    max_val = np.array([_DEFAULT_VALENCES.get(s, 4) for s in atom_map])

    # heavy-atom skeleton first, hydrogens attach as leaves afterwards
    n_h = int(n * 0.45) if "H" in atom_map else 0
    n_heavy = max(n - n_h, 1)
    heavy_types = [i for i, s in enumerate(atom_map) if s != "H"]
    h_tok = atom_map.index("H") if "H" in atom_map else -1
    p_heavy = np.array([0.7 if atom_map[t] == "C" else 0.3 /
                        max(len(heavy_types) - 1, 1) for t in heavy_types])
    a = list(rng.choice(heavy_types, size=n_heavy,
                        p=p_heavy / p_heavy.sum()))
    remaining = [int(max_val[t]) for t in a]

    bonds, bond_types = [], []

    def add_bond(i, j, order):
        bonds.append((min(i, j), max(i, j)))
        bond_types.append(order)
        remaining[i] -= order
        remaining[j] -= order

    # spanning tree over heavy atoms, respecting remaining valence; if every
    # earlier atom is saturated, relabel the previous atom carbon (when
    # available) to free budget, otherwise truncate the skeleton rather than
    # violate a valence
    truncated_at = None
    for i in range(1, n_heavy):
        candidates = [j for j in range(i) if remaining[j] >= 1]
        if not candidates and "C" in atom_map:
            j = i - 1
            a[j] = atom_map.index("C")
            used = sum(o for (u, v), o in zip(bonds, bond_types)
                       if u == j or v == j)
            remaining[j] = int(max_val[a[j]]) - used
            if remaining[j] >= 1:
                candidates = [j]
        if not candidates:
            truncated_at = i
            break
        j = int(rng.choice(candidates))
        order = 1
        if remaining[i] >= 2 and remaining[j] >= 2 and rng.random() < 0.15:
            order = 2
        add_bond(i, j, min(order, n_bond_types - 1))
    if truncated_at is not None:
        a = a[:truncated_at]
        remaining = remaining[:truncated_at]
        n_heavy = truncated_at

    # occasional ring closure
    for _ in range(max(n_heavy // 6, 0)):
        cand = [j for j in range(n_heavy) if remaining[j] >= 1]
        if len(cand) >= 2:
            i, j = rng.choice(cand, 2, replace=False)
            if i != j and (min(i, j), max(i, j)) not in set(bonds):
                add_bond(int(i), int(j), 1)

    # ---- exact saturation ---------------------------------------------------
    # Reconcile the skeleton's total open valence with the hydrogen budget so
    # that EVERY atom ends exactly saturated (the reference datasets have no
    # under-saturated heavy atoms; leaving them makes the data fail the MiDi
    # stability tables the analyzer falls back to).
    target_h = (n - n_heavy) if h_tok >= 0 else 0
    if h_tok >= 0:
        order_cap = min(3, n_bond_types - 1)
        bond_pos = {b: k for k, b in enumerate(bonds)}
        # element ladder for +/-1 valence relabels (only within atom_map)
        tok_of = {s: atom_map.index(s) for s in atom_map}

        def relabel(j, new_tok):
            used = int(max_val[a[j]]) - remaining[j]
            a[j] = new_tok
            remaining[j] = int(max_val[new_tok]) - used

        # too little open valence for the H budget: promote atoms toward C
        for j in range(n_heavy):
            if sum(remaining) >= target_h:
                break
            if atom_map[a[j]] in ("N", "O", "F") and "C" in tok_of:
                relabel(j, tok_of["C"])

        # too much open valence: consume 2 at a time via bond upgrades or ring
        # closures; fix parity (and dead ends) with -1 element relabels
        guard = 0
        while sum(remaining) > target_h and guard < 8 * n:
            guard += 1
            excess = sum(remaining) - target_h
            did = False
            if excess >= 2:
                up = [k for k, (i, j) in enumerate(bonds)
                      if bond_types[k] < order_cap and remaining[i] >= 1
                      and remaining[j] >= 1]
                cand = [j for j in range(n_heavy) if remaining[j] >= 1]
                pairs = [(i, j) for ii, i in enumerate(cand)
                         for j in cand[ii + 1:]
                         if (min(i, j), max(i, j)) not in bond_pos]
                moves = (["up"] if up else []) + (["ring"] if pairs else [])
                if moves:
                    mv = moves[int(rng.integers(len(moves)))]
                    if mv == "up":
                        k = int(rng.choice(up))
                        i, j = bonds[k]
                        bond_types[k] += 1
                        remaining[i] -= 1
                        remaining[j] -= 1
                    else:
                        i, j = pairs[int(rng.integers(len(pairs)))]
                        add_bond(int(i), int(j), 1)
                        bond_pos[bonds[-1]] = len(bonds) - 1
                    did = True
            if not did:
                # -1 relabel: C->N, N->O, O->F (whichever is available)
                done = False
                for j in range(n_heavy):
                    if remaining[j] < 1:
                        continue
                    sym = atom_map[a[j]]
                    for frm, to in (("C", "N"), ("N", "O"), ("O", "F")):
                        if sym == frm and to in tok_of:
                            relabel(j, tok_of[to])
                            done = True
                            break
                    if done:
                        break
                if not done:
                    # degenerate atom_map (no -1 relabel available): keep the
                    # size contract and leave the excess valence open
                    break
        target_h = min(target_h, sum(remaining))

    # hydrogens fill ALL leftover valence (exact saturation)
    for _ in range(target_h):
        cand = [j for j in range(n_heavy) if remaining[j] >= 1]
        if not cand:
            break
        anchor = int(rng.choice(cand))
        a.append(h_tok)
        remaining.append(0)
        add_bond(len(a) - 1, anchor, 1)

    a = np.asarray(a, np.int16)
    n = len(a)
    c = np.zeros(n, np.int16)  # neutral molecules

    # positions: lay out along the bond tree with ~1.5 A steps
    x = np.zeros((n, 3), np.float32)
    placed = np.zeros(n, bool)
    placed[0] = True
    adj_list = [[] for _ in range(n)]
    for (i, j), _o in zip(bonds, bond_types):
        adj_list[i].append(j)
        adj_list[j].append(i)
    order_q = [0]
    while order_q:
        i = order_q.pop()
        for j in adj_list[i]:
            if not placed[j]:
                step = rng.standard_normal(3)
                step = 1.45 * step / (np.linalg.norm(step) + 1e-8)
                x[j] = x[i] + step + rng.standard_normal(3) * 0.08
                placed[j] = True
                order_q.append(j)

    bonds = np.asarray(bonds, np.int32).reshape(-1, 2)
    bond_types = np.asarray(bond_types, np.int16)
    return x - x.mean(0, keepdims=True), a, c, bonds, bond_types


def generate_dataset(out_dir, n_molecules: int = 1000, seed: int = 0,
                     atom_map=("C", "H", "N", "O", "F"), n_bond_types: int = 4,
                     hist_asset: Optional[str] = None, splits=(0.9, 0.05, 0.05),
                     size_range: Optional[Tuple[int, int]] = None):
    """Write train/val/test packed .npz + stats files into out_dir.

    `size_range=(lo, hi)` overrides the histogram with uniform sizes — used
    to stress the largest O(N^2) buckets (GEOM tops out at 181 atoms but the
    histogram tail is too thin to draw them reliably)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_atom_types = len(atom_map)

    if size_range is not None:
        sizes = rng.integers(size_range[0], size_range[1] + 1,
                             size=n_molecules)
    elif hist_asset and Path(hist_asset).exists():
        d = np.load(hist_asset)
        hist = NAtomsDistribution(d["n_atoms"], d["counts"])
        sizes = hist.sample(rng, n_molecules)
    else:
        sizes = rng.integers(6, 30, size=n_molecules)

    mols = [generate_molecule(rng, int(s), n_atom_types,
                              n_bond_types=n_bond_types,
                              atom_map=atom_map) for s in sizes]

    n_train = int(splits[0] * n_molecules)
    n_val = int(splits[1] * n_molecules)
    split_mols = {"train": mols[:n_train],
                  "val": mols[n_train:n_train + n_val],
                  "test": mols[n_train + n_val:]}

    for split, ms in split_mols.items():
        if not ms:
            continue
        xs, as_, cs, bts, bis, nidx, eidx = [], [], [], [], [], [], []
        n_off = e_off = 0
        for x, a, c, bonds, bond_types in ms:
            n = x.shape[0]
            xs.append(x)
            as_.append(a)
            cs.append(c)
            bis.append(bonds)
            bts.append(bond_types)
            nidx.append((n_off, n_off + n))
            eidx.append((e_off, e_off + bonds.shape[0]))
            n_off += n
            e_off += bonds.shape[0]
        save_packed(out / f"{split}_data_processed.npz",
                    np.concatenate(xs), np.concatenate(as_),
                    np.concatenate(cs), np.concatenate(bts),
                    np.concatenate(bis), np.asarray(nidx), np.asarray(eidx))

        a_all = np.concatenate(as_).astype(np.int64)
        c_all = (np.concatenate(cs).astype(np.int64) + 2).clip(0, 5)
        b_all = np.concatenate(bts).astype(np.int64)
        n_pairs = sum(x.shape[0] * (x.shape[0] - 1) // 2 for x, *_ in ms)
        marg = compute_marginals(a_all, c_all, b_all, n_atom_types,
                                 n_bond_types=n_bond_types,
                                 n_no_bond=n_pairs - len(b_all))
        marg.save(out / f"{split}_data_marginal_dists.npz")
        sizes_split = np.array([x.shape[0] for x, *_ in ms])
        NAtomsDistribution.from_sizes(sizes_split).save(
            out / f"{split}_data_n_atoms_histogram.npz")

        # observed (element, charge) -> valency table, the same artifact the
        # real pipelines emit (process_qm9.py valencies json); SampleAnalyzer
        # prefers it over the legacy MiDi table.  In 5-class (aromatic)
        # datasets, the reference's explicit-aromaticity convention records
        # (n_aromatic_bonds, non_aromatic_valency) integer pairs instead of
        # rounding a 1.5-summed float (process_geom.py:92-110).
        explicit_arom = n_bond_types == 5
        rows = []
        for x, a, c, bonds, bond_types in ms:
            if explicit_arom:
                n_arom = np.zeros(x.shape[0], np.int64)
                non_arom = np.zeros(x.shape[0], np.int64)
                for (i, j), t in zip(bonds, bond_types):
                    if int(t) == 4:
                        n_arom[i] += 1
                        n_arom[j] += 1
                    else:
                        non_arom[i] += int(t)
                        non_arom[j] += int(t)
                rows.extend(
                    (int(a[k]), int(c[k]), int(n_arom[k]), int(non_arom[k]))
                    for k in range(x.shape[0]))
            else:
                val = np.zeros(x.shape[0], np.int64)
                for (i, j), t in zip(bonds, bond_types):
                    val[i] += int(t)
                    val[j] += int(t)
                rows.extend((int(a[k]), int(c[k]), int(val[k]))
                            for k in range(x.shape[0]))
        from flowmol_tpu.data.featurizer import build_valency_table
        table = build_valency_table(np.asarray(rows, np.int64), atom_map,
                                    explicit_aromaticity=explicit_arom)
        suffix = "aromatic" if n_bond_types == 5 else "kekulized"
        import json
        with open(out / f"{split}_data_valencies_{suffix}.json", "w") as f:
            json.dump(table, f, indent=1)
    return out
