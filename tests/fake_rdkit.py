"""A minimal in-memory stand-in for the RDKit API surface used by
`flowmol_tpu.data.featurizer` and `process_qm9.py`.

The real RDKit is not installable in this image (VERDICT r1 item 3); this
fixture lets the data-processing pipeline execute end to end — sanitize /
kekulize / fragment / atom-map taxonomy, adjacency extraction with bond
orders, SDF supplier iteration — against molecules whose ground truth the
test controls exactly.  API parity target: the calls made by the reference's
featurizer (/root/reference/flowmol/data_processing/geom.py:132-246) and
process_qm9.py:64-84.
"""

from __future__ import annotations

import sys
import types
from typing import List, Optional, Sequence

import numpy as np


class FakeAtom:
    def __init__(self, symbol: str, charge: int = 0, idx: int = 0):
        self._symbol = symbol
        self._charge = charge
        self._idx = idx

    def GetSymbol(self) -> str:
        return self._symbol

    def GetFormalCharge(self) -> int:
        return self._charge

    def GetIdx(self) -> int:
        return self._idx


class FakeConformer:
    def __init__(self, positions: np.ndarray):
        self._pos = np.asarray(positions, np.float64)

    def GetPositions(self) -> np.ndarray:
        return self._pos

    def GetAtomPosition(self, i: int) -> "Point3D":
        return Point3D(*self._pos[i])


class FakeMol:
    """adj uses RDKit bond-order convention: 0 none, 1/2/3, 1.5 aromatic."""

    def __init__(self, symbols: Sequence[str], positions, adj,
                 charges: Optional[Sequence[int]] = None,
                 bad_sanitize: bool = False, bad_kekulize: bool = False,
                 kekulized_adj=None, smiles: str = ""):
        self.symbols = list(symbols)
        self.positions = np.asarray(positions, np.float64)
        self.adj = np.asarray(adj, np.float64)
        self.charges = list(charges or [0] * len(self.symbols))
        self.bad_sanitize = bad_sanitize
        self.bad_kekulize = bad_kekulize
        self.kekulized_adj = (None if kekulized_adj is None
                              else np.asarray(kekulized_adj, np.float64))
        self.smiles = smiles
        self._props = {}

    def GetNumAtoms(self) -> int:
        return len(self.symbols)

    def GetAtoms(self) -> List[FakeAtom]:
        return [FakeAtom(s, c, i)
                for i, (s, c) in enumerate(zip(self.symbols, self.charges))]

    def GetConformer(self) -> FakeConformer:
        return FakeConformer(self.positions)

    def SetProp(self, key: str, val: str):
        self._props[key] = str(val)

    def GetProp(self, key: str) -> str:
        return self._props[key]

    def HasProp(self, key: str) -> bool:
        return key in self._props


class MolSanitizeException(Exception):
    pass


class KekulizeException(MolSanitizeException):
    pass


def SanitizeMol(mol: FakeMol):
    if mol.bad_sanitize:
        raise MolSanitizeException("fixture: sanitization failure")


def Kekulize(mol: FakeMol, clearAromaticFlags: bool = False):
    if mol.bad_kekulize:
        raise KekulizeException("fixture: kekulization failure")
    if mol.kekulized_adj is not None:
        mol.adj = mol.kekulized_adj
    elif (mol.adj == 1.5).any():
        raise KekulizeException("fixture: aromatic bonds but no kekulized_adj")


def RemoveHs(mol: FakeMol) -> FakeMol:
    keep = [i for i, s in enumerate(mol.symbols) if s != "H"]
    return FakeMol([mol.symbols[i] for i in keep], mol.positions[keep],
                   mol.adj[np.ix_(keep, keep)],
                   [mol.charges[i] for i in keep], smiles=mol.smiles)


def GetMolFrags(mol: FakeMol, sanitizeFrags: bool = False):
    n = mol.GetNumAtoms()
    seen = np.zeros(n, bool)
    frags = []
    for root in range(n):
        if seen[root]:
            continue
        stack, comp = [root], []
        seen[root] = True
        while stack:
            i = stack.pop()
            comp.append(i)
            for j in np.nonzero(mol.adj[i] > 0)[0]:
                if not seen[j]:
                    seen[j] = True
                    stack.append(int(j))
        frags.append(tuple(comp))
    return tuple(frags)


def MolToSmiles(mol: FakeMol, isomericSmiles: bool = True) -> str:
    return mol.smiles


class SDMolSupplier:
    """Yields the molecules registered via `set_sdf_molecules` (the fixture
    controls content; the path is ignored, matching how tests inject raw
    data without a real SDF parser)."""

    _registry: List[Optional[FakeMol]] = []

    def __init__(self, path: str, removeHs: bool = False,
                 sanitize: bool = True):
        self._mols = list(SDMolSupplier._registry)

    def __iter__(self):
        return iter(self._mols)


def set_sdf_molecules(mols: Sequence[Optional[FakeMol]]):
    SDMolSupplier._registry = list(mols)


def _adjacency_matrix(mol: FakeMol, useBO: bool = False):
    return mol.adj if useBO else (mol.adj > 0).astype(np.float64)


def GetFormalCharge(mol: FakeMol) -> int:
    return int(sum(mol.charges))


# fixture molblock format (what the stub `xtb` binary in the tests emits):
#   FAKEMOL <n>
#   <symbol> <x> <y> <z>      (n lines; no bonds — xtbtopo parsing only
#                              needs atoms+coords downstream)

def MolFromMolBlock(block: str, sanitize: bool = True,
                    removeHs: bool = False) -> Optional[FakeMol]:
    lines = [l for l in block.strip().splitlines() if l.strip()]
    if not lines or not lines[0].startswith("FAKEMOL"):
        return None
    n = int(lines[0].split()[1])
    syms, pos = [], []
    for line in lines[1:1 + n]:
        parts = line.split()
        syms.append(parts[0])
        pos.append([float(v) for v in parts[1:4]])
    return FakeMol(syms, np.asarray(pos), np.zeros((n, n)))


def MolToMolBlock(mol: FakeMol, kekulize: bool = True) -> str:
    rows = [f"FAKEMOL {mol.GetNumAtoms()}"]
    for s, p in zip(mol.symbols, mol.positions):
        rows.append(f"{s} {p[0]} {p[1]} {p[2]}")
    return "\n".join(rows) + "\n"


class SDWriter:
    """Writes the fixture molblock format with $$$$ record separators and
    mirrors every written molecule into `SDWriter.written[path]` so tests
    can assert on content without a real SDF parser."""

    written = {}

    def __init__(self, path: str):
        self._path = str(path)
        self._f = open(self._path, "w")
        SDWriter.written[self._path] = []

    def write(self, mol: FakeMol):
        self._f.write(MolToMolBlock(mol) + "$$$$\n")
        SDWriter.written[self._path].append(mol)

    def close(self):
        self._f.close()


class Point3D:
    def __init__(self, x=0.0, y=0.0, z=0.0):
        self.x, self.y, self.z = x, y, z


def install():
    """Register fake `rdkit` / `rdkit.Chem` / `rdkit.Geometry` modules in
    sys.modules.  Returns the Chem module.  Call `uninstall()` to restore."""
    rdkit = types.ModuleType("rdkit")
    chem = types.ModuleType("rdkit.Chem")
    geom = types.ModuleType("rdkit.Geometry")
    rdmolops = types.ModuleType("rdkit.Chem.rdmolops")
    rdmolops.GetAdjacencyMatrix = _adjacency_matrix
    for name in ("SanitizeMol", "Kekulize", "RemoveHs", "GetMolFrags",
                 "MolToSmiles", "SDMolSupplier", "MolSanitizeException",
                 "KekulizeException", "GetFormalCharge", "MolFromMolBlock",
                 "MolToMolBlock", "SDWriter"):
        setattr(chem, name, globals()[name])
    chem.rdmolops = rdmolops
    geom.Point3D = Point3D
    rdkit.Chem = chem
    rdkit.Geometry = geom
    sys.modules["rdkit"] = rdkit
    sys.modules["rdkit.Chem"] = chem
    sys.modules["rdkit.Geometry"] = geom
    sys.modules["rdkit.Chem.rdmolops"] = rdmolops
    return chem


def uninstall():
    for name in ("rdkit", "rdkit.Chem", "rdkit.Geometry",
                 "rdkit.Chem.rdmolops"):
        sys.modules.pop(name, None)
