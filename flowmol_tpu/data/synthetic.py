"""Synthetic molecule dataset generator.

The container has neither the raw GEOM/QM9 data nor RDKit, so for tests,
smoke training and benchmarking we generate chemically-plausible fake
molecules: sizes drawn from the real dataset histograms (assets/data/*),
atom types/charges from the real marginals, positions from a random-walk
with bond-length-scaled steps, and bonds from a random spanning tree plus
extra short-range edges.  The storage format and every downstream code path
(batching, priors, training, sampling, analysis) are identical to real data.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from flowmol_tpu.data.dataset import save_packed
from flowmol_tpu.data.stats import (MarginalDists, NAtomsDistribution,
                                    compute_marginals)


def generate_molecule(rng: np.random.Generator, n: int, n_atom_types: int,
                      n_charges: int = 6, n_bond_types: int = 4,
                      p_a: Optional[np.ndarray] = None):
    if p_a is None:
        p_a = np.ones(n_atom_types) / n_atom_types
    a = rng.choice(n_atom_types, size=n, p=p_a / p_a.sum()).astype(np.int16)
    # charges concentrated at 0 (token 2 after +2 offset)
    c = rng.choice([-1, 0, 1], size=n, p=[0.05, 0.9, 0.05]).astype(np.int16)

    # positions: branched random walk with ~1.5 A steps
    x = np.zeros((n, 3), np.float32)
    parents = np.zeros(n, np.int64)
    for i in range(1, n):
        parents[i] = rng.integers(0, i)
        step = rng.standard_normal(3)
        step = 1.5 * step / (np.linalg.norm(step) + 1e-8)
        x[i] = x[parents[i]] + step + rng.standard_normal(3) * 0.1

    # bonds: spanning tree edges + a few ring-closing short-range edges
    bonds = [(int(parents[i]), i) for i in range(1, n)]
    if n > 4:
        d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
        iu, ju = np.triu_indices(n, 1)
        close = np.argsort(d[iu, ju])[: n // 4]
        existing = set(bonds)
        for k in close:
            p = (int(iu[k]), int(ju[k]))
            if p not in existing and rng.random() < 0.3:
                bonds.append(p)
                existing.add(p)
    bonds = np.asarray(bonds, np.int32).reshape(-1, 2)
    bond_types = rng.choice(np.arange(1, n_bond_types),
                            size=bonds.shape[0],
                            p=_bond_p(n_bond_types)).astype(np.int16)
    return x - x.mean(0, keepdims=True), a, c, bonds, bond_types


def _bond_p(n_bond_types: int) -> np.ndarray:
    # single bonds dominate
    p = np.array([0.85, 0.12, 0.03, 0.05][: n_bond_types - 1], np.float64)
    return p / p.sum()


def generate_dataset(out_dir, n_molecules: int = 1000, seed: int = 0,
                     atom_map=("C", "H", "N", "O", "F"), n_bond_types: int = 4,
                     hist_asset: Optional[str] = None, splits=(0.9, 0.05, 0.05)):
    """Write train/val/test packed .npz + stats files into out_dir."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_atom_types = len(atom_map)

    if hist_asset and Path(hist_asset).exists():
        d = np.load(hist_asset)
        hist = NAtomsDistribution(d["n_atoms"], d["counts"])
        sizes = hist.sample(rng, n_molecules)
    else:
        sizes = rng.integers(6, 30, size=n_molecules)

    mols = [generate_molecule(rng, int(s), n_atom_types,
                              n_bond_types=n_bond_types) for s in sizes]

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
    return out
