"""SampledMolecule: sampled tensors -> molecule object (+ optional RDKit mol).

Parity target: /root/reference/flowmol/analysis/molecule_builder.py
(`SampledMolecule` 17-128, `extract_moldata_from_graph` 217-265,
`build_molecule` 268-297, `compute_valencies` 135-154).

Design deltas: inputs are the padded dense arrays the TPU sampler emits
(positions + integer tokens + symmetric bond matrix) instead of a DGL graph;
RDKit is an *optional* dependency — all structural logic (valencies,
connectivity, fragment stats) is pure numpy so the analysis suite runs in
RDKit-less environments, with RDKit-specific functionality gated.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    from rdkit import Chem
    from rdkit.Geometry import Point3D
    HAVE_RDKIT = True
except Exception:  # pragma: no cover
    Chem = None
    HAVE_RDKIT = False

# bond token -> RDKit bond type index convention of the reference
# (molecule_builder.py:10-14): 0 none, 1 single, 2 double, 3 triple,
# 4 aromatic, 5 mask (treated as none)
BOND_ORDER = np.array([0.0, 1.0, 2.0, 3.0, 1.5, 0.0])


class SampledMolecule:
    """One sampled molecule.

    positions: (n, 3); atom_tokens: (n,) int into atom_type_map (+fake,+mask);
    charge_tokens: (n,) int in [0, 5] (charge = token - 2);
    bonds: (n, n) int symmetric bond-type matrix (0 = no bond).
    """

    def __init__(self, positions: np.ndarray, atom_tokens: np.ndarray,
                 charge_tokens: np.ndarray, bonds: np.ndarray,
                 atom_type_map: Sequence[str], ctmc_mol: bool = True,
                 fake_atoms: bool = False, explicit_aromaticity: bool = False,
                 traj_frames: Optional[Dict[str, np.ndarray]] = None):
        atom_type_map = list(atom_type_map)
        if fake_atoms:
            atom_type_map.append("Sn")  # fake atoms decode as tin
        if ctmc_mol:
            atom_type_map.append("Se")  # mask tokens decode as selenium
        self.atom_type_map = atom_type_map
        self.ctmc_mol = ctmc_mol
        self.fake_atoms = fake_atoms
        self.explicit_aromaticity = explicit_aromaticity
        self.traj_frames = traj_frames

        positions = np.asarray(positions, np.float64)
        atom_tokens = np.asarray(atom_tokens, np.int64)
        charge_tokens = np.asarray(charge_tokens, np.int64)
        bonds = np.asarray(bonds, np.int64)

        # strip fake atoms (molecule_builder.py:227-231); the fake class sits
        # right after the real elements: [real..., 'Sn'(fake), 'Se'(mask)]
        if fake_atoms:
            fake_idx = len(atom_type_map) - 1 - (1 if ctmc_mol else 0)
            keep = atom_tokens != fake_idx
            positions = positions[keep]
            atom_tokens = atom_tokens[keep]
            charge_tokens = charge_tokens[keep]
            bonds = bonds[np.ix_(keep, keep)]

        # masked bonds -> no bond (molecule_builder.py:249-250)
        mask_bond = 5 if explicit_aromaticity else 4
        bonds = np.where(bonds == mask_bond, 0, bonds)

        self.positions = positions
        self.atom_tokens = atom_tokens
        self.atom_types = [atom_type_map[t] for t in atom_tokens]
        self.atom_charges = charge_tokens - 2
        self.bonds = bonds
        self.num_atoms = positions.shape[0]

        iu, ju = np.triu_indices(self.num_atoms, 1)
        nz = bonds[iu, ju] != 0
        self.bond_src_idxs = iu[nz]
        self.bond_dst_idxs = ju[nz]
        self.bond_types = bonds[iu, ju][nz]

        self.valencies = self.compute_valencies(
            arom_dependent=explicit_aromaticity)
        self._rdkit_mol = None

    # ----------------------------------------------------------- constructors
    @classmethod
    def from_rdkit_mol(cls, mol, atom_type_map: Optional[Sequence[str]] = None,
                       **kwargs) -> "SampledMolecule":
        """Build from an RDKit molecule — the reverse constructor the
        baseline-comparison flow needs (molecule_builder.py:86-128).

        Aromatic bonds (order 1.5 in the adjacency) map to token 4; charges
        are stored offset by +2 to mirror the sampled-token convention.
        """
        if not HAVE_RDKIT:
            raise ImportError("from_rdkit_mol requires RDKit")
        if atom_type_map is None:
            atom_type_map = sorted({a.GetSymbol() for a in mol.GetAtoms()})
        tok = {s: i for i, s in enumerate(atom_type_map)}

        n = mol.GetNumAtoms()
        positions = np.asarray(mol.GetConformer().GetPositions(), np.float64)
        atom_tokens = np.zeros(n, np.int64)
        charge_tokens = np.zeros(n, np.int64)
        for i, atom in enumerate(mol.GetAtoms()):
            atom_tokens[i] = tok[atom.GetSymbol()]
            charge_tokens[i] = atom.GetFormalCharge() + 2

        adj = np.asarray(Chem.rdmolops.GetAdjacencyMatrix(mol, useBO=True),
                         np.float64)
        bonds = np.where(adj == 1.5, 4, adj).astype(np.int64)
        kwargs.setdefault("ctmc_mol", False)
        # token 4 is aromatic only under explicit aromaticity; without it the
        # constructor would treat 4 as the mask token and drop those bonds
        kwargs.setdefault("explicit_aromaticity", bool((adj == 1.5).any()))
        return cls(positions, atom_tokens, charge_tokens, bonds,
                   atom_type_map, **kwargs)

    # ------------------------------------------------------------- structure
    def compute_valencies(self, arom_dependent: bool = False) -> np.ndarray:
        """Sum of bond orders per atom; aromatic counts 1.5.  With explicit
        aromaticity, returns (n, 2) [n_aromatic, non-aromatic valence]
        (molecule_builder.py:135-154)."""
        order = BOND_ORDER[np.clip(self.bonds, 0, 5)]
        val = order.sum(-1)
        if arom_dependent:
            n_arom = (order == 1.5).sum(-1)
            non_arom = (val - n_arom * 1.5).astype(np.int64)
            return np.stack([n_arom, non_arom], 1)
        return val

    def connected_components(self) -> np.ndarray:
        """Label array (n,) of connected components (pure numpy BFS)."""
        n = self.num_atoms
        labels = np.full(n, -1, np.int64)
        adj = self.bonds > 0
        comp = 0
        for start in range(n):
            if labels[start] >= 0:
                continue
            stack = [start]
            labels[start] = comp
            while stack:
                i = stack.pop()
                for j in np.nonzero(adj[i] & (labels < 0))[0]:
                    labels[j] = comp
                    stack.append(j)
            comp += 1
        return labels

    @property
    def num_components(self) -> int:
        if self.num_atoms == 0:
            return 0
        return int(self.connected_components().max()) + 1

    @property
    def largest_frag_frac(self) -> float:
        if self.num_atoms == 0:
            return 0.0
        labels = self.connected_components()
        counts = np.bincount(labels)
        return float(counts.max()) / self.num_atoms

    # ---------------------------------------------------------------- RDKit
    @property
    def rdkit_mol(self):
        if self._rdkit_mol is None:
            self._rdkit_mol = self.build_molecule()
        return self._rdkit_mol

    def build_molecule(self):
        """RDKit RWMol + conformer (molecule_builder.py:268-297).  Returns
        None without RDKit."""
        if not HAVE_RDKIT:
            return None
        rd_bond = [None, Chem.rdchem.BondType.SINGLE, Chem.rdchem.BondType.DOUBLE,
                   Chem.rdchem.BondType.TRIPLE, Chem.rdchem.BondType.AROMATIC,
                   None]
        mol = Chem.RWMol()
        for sym, charge in zip(self.atom_types, self.atom_charges):
            a = Chem.Atom(sym)
            if charge != 0:
                a.SetFormalCharge(int(charge))
            mol.AddAtom(a)
        for bt, si, di in zip(self.bond_types, self.bond_src_idxs,
                              self.bond_dst_idxs):
            mol.AddBond(int(si), int(di), rd_bond[int(bt)])
        try:
            mol = mol.GetMol()
        except Exception:
            return None
        conf = Chem.Conformer(mol.GetNumAtoms())
        for i, (x, y, z) in enumerate(self.positions):
            conf.SetAtomPosition(i, Point3D(float(x), float(y), float(z)))
        mol.AddConformer(conf)
        return mol


def molecules_from_sampled_state(state: Dict[str, np.ndarray],
                                 node_mask: np.ndarray,
                                 atom_type_map: Sequence[str],
                                 ctmc_mol: bool = True,
                                 fake_atoms: bool = False,
                                 explicit_aromaticity: bool = False
                                 ) -> List[SampledMolecule]:
    """Split the padded sampler output into per-molecule SampledMolecules.

    state: {'x': (B,N,3), 'a': (B,N) tokens, 'c': (B,N) tokens,
            'e_up': (B,M) tokens} (CTMC) as produced by FlowMol.integrate.
    """
    x = np.asarray(state["x"])
    a = np.asarray(state["a"])
    c = np.asarray(state["c"])
    if a.ndim == 3:  # continuous simplex state -> tokens
        a = a.argmax(-1)
    if c.ndim == 3:
        c = c.argmax(-1)
    nm = np.asarray(node_mask)
    B, n_pad = nm.shape
    iu, ju = np.triu_indices(n_pad, 1)

    if "e_up" in state:
        e_up = np.asarray(state["e_up"])
        e_dense = np.zeros((B, n_pad, n_pad), np.int64)
        e_dense[:, iu, ju] = e_up
        e_dense[:, ju, iu] = e_up
    else:
        e_dense = np.asarray(state["e"]).argmax(-1)

    mols = []
    for b in range(B):
        n = int(nm[b].sum())
        mols.append(SampledMolecule(
            x[b, :n], a[b, :n], c[b, :n], e_dense[b, :n, :n], atom_type_map,
            ctmc_mol=ctmc_mol, fake_atoms=fake_atoms,
            explicit_aromaticity=explicit_aromaticity))
    return mols


def trajectory_xyz_frames(traj: Dict[str, np.ndarray], mol_idx: int,
                          node_mask: np.ndarray,
                          atom_type_map: Sequence[str],
                          endpoint: bool = False,
                          align_to_final: bool = True,
                          fake_atoms: bool = False,
                          ctmc_mol: bool = True) -> List[str]:
    """Per-molecule trajectory as multi-frame XYZ strings.

    traj: stacked scan frames from FlowMol.integrate(visualize=True) —
    {'x','a','c','e_up','x_pred','a_pred',...} each (T, B, ...).
    Frames are Kabsch-aligned to the final frame like the reference's
    `process_traj_frames` (molecule_builder.py:156-214).  Mask tokens decode
    as 'Se', fake atoms as 'Sn' (both shown in trajectories).
    """
    from flowmol_tpu.data.priors import np_rigid_align

    amap = list(atom_type_map)
    if fake_atoms:
        amap.append("Sn")
    if ctmc_mol:
        amap.append("Se")
    n = int(np.asarray(node_mask)[mol_idx].sum())
    key_x = "x_pred" if endpoint else "x"
    key_a = "a_pred" if endpoint else "a"
    if key_x not in traj:
        raise KeyError(
            f"trajectory has no '{key_x}' frames (the vector-field "
            "parameterization has no endpoint estimate to record — "
            "vector_field.py:463-466; all others record {feat}_pred frames)")
    xs = np.asarray(traj[key_x])[:, mol_idx, :n]
    ats = np.asarray(traj[key_a])[:, mol_idx, :n]
    if ats.ndim == 3:  # continuous simplex states -> tokens
        ats = ats.argmax(-1)
    x_final = xs[-1]
    frames = []
    for t in range(xs.shape[0]):
        pos = (np_rigid_align(xs[t].astype(np.float64), x_final)
               if align_to_final else xs[t])
        lines = [str(n), f"frame {t}"]
        for i in range(n):
            tok = int(ats[t, i]) if ats.ndim == 2 else int(ats[t])
            sym = amap[tok] if tok < len(amap) else "Se"
            lines.append(f"{sym} {pos[i, 0]:.4f} {pos[i, 1]:.4f} "
                         f"{pos[i, 2]:.4f}")
        frames.append("\n".join(lines))
    return frames


def trajectory_sdf(traj: Dict[str, np.ndarray], mol_idx: int,
                   node_mask: np.ndarray,
                   atom_type_map: Sequence[str],
                   endpoint: bool = False,
                   align_to_final: bool = True,
                   fake_atoms: bool = False,
                   ctmc_mol: bool = True) -> str:
    """Per-molecule trajectory as a multi-record SDF string, BONDS INCLUDED.

    Parity with the reference's bonded trajectory molecules
    (/root/reference/flowmol/analysis/molecule_builder.py:156-214 builds
    per-step molecules, /root/reference/test.py:224-259 writes them as SDF):
    each scan frame becomes one V2000 mol block with the frame's current
    (or endpoint-predicted) atom/charge/bond tokens, Kabsch-aligned to the
    final frame.  Written by hand (no RDKit dependency): atom block, bond
    block from the per-step edge tokens, M CHG lines.  Mask tokens decode
    as 'Se', fake atoms as 'Sn'; mask/none bond tokens draw no bond.
    """
    from flowmol_tpu.data.priors import np_rigid_align

    amap = list(atom_type_map)
    if fake_atoms:
        amap.append("Sn")
    if ctmc_mol:
        amap.append("Se")
    n = int(np.asarray(node_mask)[mol_idx].sum())
    sfx = "_pred" if endpoint else ""
    key_x = "x_pred" if endpoint else "x"
    if key_x not in traj:
        raise KeyError(
            f"trajectory has no '{key_x}' frames (the vector-field "
            "parameterization has no endpoint estimate to record)")
    xs = np.asarray(traj[key_x])[:, mol_idx, :n]
    ats = np.asarray(traj["a" + sfx])[:, mol_idx, :n]
    chs = np.asarray(traj["c" + sfx])[:, mol_idx, :n]
    if ats.ndim == 3:
        ats = ats.argmax(-1)
    if chs.ndim == 3:
        chs = chs.argmax(-1)

    n_pad = np.asarray(node_mask).shape[1]
    iu, ju = np.triu_indices(n_pad, 1)
    keep = (iu < n) & (ju < n)
    iu, ju = iu[keep], ju[keep]
    if "e_up" + sfx in traj:
        eups = np.asarray(traj["e_up" + sfx])[:, mol_idx]
        if eups.ndim == 3:
            eups = eups.argmax(-1)
        eups = eups[:, keep]
    else:  # continuous parameterizations record dense simplex edge states
        e_dense = np.asarray(traj["e" + sfx])[:, mol_idx].argmax(-1)
        eups = e_dense[:, iu, ju]

    x_final = xs[-1]
    # SDF bond orders: 1 single, 2 double, 3 triple, 4 aromatic; 0/mask: none
    n_bond_real = 4
    records = []
    for t in range(xs.shape[0]):
        pos = (np_rigid_align(xs[t].astype(np.float64), x_final)
               if align_to_final else xs[t])
        bonds = [(int(i) + 1, int(j) + 1, int(b))
                 for i, j, b in zip(iu, ju, eups[t])
                 if 1 <= b <= n_bond_real]
        lines = [f"frame {t}", "  flowmol_tpu trajectory", ""]
        lines.append(f"{n:3d}{len(bonds):3d}  0  0  0  0  0  0  0  0999 V2000")
        charges = []
        for i in range(n):
            tok = int(ats[t, i])
            sym = amap[tok] if tok < len(amap) else "Se"
            lines.append(f"{pos[i, 0]:10.4f}{pos[i, 1]:10.4f}"
                         f"{pos[i, 2]:10.4f} {sym:<3s} 0  0  0  0  0  0  0"
                         "  0  0  0  0  0")
            chg = int(chs[t, i]) - 2
            if chg:
                charges.append((i + 1, chg))
        for i, j, b in bonds:
            lines.append(f"{i:3d}{j:3d}{b:3d}  0")
        for k in range(0, len(charges), 8):
            grp = charges[k:k + 8]
            lines.append("M  CHG" + f"{len(grp):3d}" +
                         "".join(f"{a:4d}{c:4d}" for a, c in grp))
        lines.append("M  END")
        lines.append("$$$$")
        records.append("\n".join(lines))
    return "\n".join(records) + "\n"
