"""Compatibility alias: `import flowmol` resolves to the TPU framework.

Code written against the reference package name
(/root/reference/flowmol/__init__.py — `flowmol.load_pretrained`, etc.)
works unchanged; everything re-exports from `flowmol_tpu`.  New code should
import `flowmol_tpu` directly.
"""

from flowmol_tpu import *  # noqa: F401,F403
from flowmol_tpu import MolBatch, load_pretrained  # noqa: F401
