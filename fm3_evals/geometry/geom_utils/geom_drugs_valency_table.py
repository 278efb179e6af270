"""GEOM-Drugs valency tables (chemistry data).

These are dataset-derived factual tables mirroring
/root/reference/fm3_evals/geometry/geom_utils/geom_drugs_valency_table.py:

* `geom_drugs_h_valencies` — allowed total valence per (element, charge),
  derived from the cleaned/filtered GEOM-Drugs set with explicit H.
* `geom_drugs_h_tuple_valencies` — allowed (n_aromatic_bonds,
  non_aromatic_valence) tuples per (element, charge), for aromatic-aware
  stability checks.
* `geom_drugs_h_legacy_valencies` — the legacy MiDi/EQGAT/SemlaFlow table,
  kept for benchmarking older models (contains known-implausible entries).
"""

geom_drugs_h_valencies = {
    "Br": {0: [1], 1: [2]},
    "C": {0: [4], -1: [3], 1: [3]},
    "N": {0: [3], 1: [4], -1: [2], -2: [1]},
    "H": {0: [1]},
    "S": {0: [2, 6, 3], 1: [3], 2: [4], 3: [5, 2], -1: [1]},
    "O": {0: [2], -1: [1], 1: [3]},
    "F": {0: [1]},
    "Cl": {0: [1], 1: [2]},
    "P": {0: [5, 3], 1: [4]},
    "I": {0: [1], 1: [2], 2: [3]},
    "Si": {0: [4], 1: [5]},
    "B": {-1: [4], 0: [3]},
    "Bi": {2: [5], 0: [3]},
}

geom_drugs_h_tuple_valencies = {
    "Br": {0: [(0, 1)], 1: [(0, 2)]},
    "C": {0: [(0, 4), (2, 2), (2, 1), (3, 0)],
          -1: [(0, 3), (2, 1), (3, 0)],
          1: [(0, 3), (2, 1), (3, 0)]},
    "N": {0: [(0, 3), (2, 0), (2, 1), (3, 0)],
          1: [(0, 4), (2, 0), (2, 1), (2, 2), (3, 0)],
          -1: [(0, 2), (2, 0)],
          -2: [(0, 1)]},
    "H": {0: [(0, 1)]},
    "S": {0: [(0, 2), (0, 3), (0, 6), (2, 0)],
          1: [(0, 3), (2, 0), (2, 1), (3, 0)],
          2: [(0, 4), (2, 1), (2, 2)],
          3: [(0, 2), (0, 5)],
          -1: [(0, 1)]},
    "O": {0: [(0, 2), (2, 0)], -1: [(0, 1)], 1: [(0, 3)]},
    "F": {0: [(0, 1)]},
    "Cl": {0: [(0, 1)], 1: [(0, 2)]},
    "P": {0: [(0, 3), (0, 5)], 1: [(0, 4)]},
    "I": {0: [(0, 1)], 1: [(0, 2)], 2: [(0, 3)]},
    "Si": {0: [(0, 4)], 1: [(0, 5)]},
    "B": {-1: [(0, 4)], 0: [(0, 3)]},
    "Bi": {0: [(0, 3)], 2: [(0, 5)]},
}

geom_drugs_h_legacy_valencies = {
    "H": {0: 1, 1: 0, -1: 0},
    "C": {0: [3, 4], 1: 3, -1: 3},
    "N": {0: [2, 3], 1: [2, 3, 4], -1: 2},
    "O": {0: 2, 1: 3, -1: 1},
    "F": {0: 1, -1: 0},
    "B": 3, "Al": 3, "Si": 4,
    "P": {0: [3, 5], 1: 4},
    "S": {0: [2, 6], 1: [2, 3], 2: 4, 3: 5, -1: 3},
    "Cl": 1, "As": 3,
    "Br": {0: 1, 1: 2}, "I": 1, "Hg": [1, 2], "Bi": [3, 5],
    "Se": [2, 4, 6],
}
