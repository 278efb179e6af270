"""flowmol_tpu — a TPU-native flow-matching framework for 3D molecule generation.

Re-implements the capabilities of FlowMol (FlowMol3, arXiv:2508.12629) with a
JAX/XLA/Pallas-first design: dense padded molecule batches, one jitted train
step, a lax.scan sampler, and pjit data parallelism over a device mesh.
"""

__version__ = "0.1.0"

from flowmol_tpu.graphs import MolBatch  # noqa: F401


def load_pretrained(model_name: str, model_dir=None):
    """Load a pretrained model by name (parity with flowmol.load_pretrained,
    /root/reference/flowmol/__init__.py:30-56).

    Checkpoints are resolved under `model_dir` (default ./trained_models) with
    the run-directory contract `<name>/config.yaml` + `<name>/checkpoints/`.
    """
    from flowmol_tpu.api import load_pretrained as _lp
    return _lp(model_name, model_dir=model_dir)
