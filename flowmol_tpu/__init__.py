"""flowmol_tpu — a TPU-native flow-matching framework for 3D molecule generation.

Re-implements the capabilities of FlowMol (FlowMol3, arXiv:2508.12629) with a
JAX/XLA/Pallas-first design: dense padded molecule batches, one jitted train
step, a lax.scan sampler, and pjit data parallelism over a device mesh.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# persistent XLA compilation cache (first compile of the full model is slow;
# subsequent process launches reuse the cached executable)
# this jax build defaults to low-precision (bf16-pass) matmuls for float32
# inputs on every backend; geometry (Kabsch, distances, norms) needs true
# f32.  The hot message-passing loop opts into bf16 explicitly via
# VectorFieldConfig.compute_dtype, so this only affects f32-typed math.
_jax.config.update("jax_default_matmul_precision", "highest")

if not _os.environ.get("FLOWMOL_NO_COMPILE_CACHE"):
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_flowmol"))
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from flowmol_tpu.graphs import MolBatch  # noqa: F401


def load_pretrained(model_name: str, model_dir=None):
    """Load a pretrained model by name (parity with flowmol.load_pretrained,
    /root/reference/flowmol/__init__.py:30-56).

    Checkpoints are resolved under `model_dir` (default ./trained_models) with
    the run-directory contract `<name>/config.yaml` + `<name>/checkpoints/`.
    """
    from flowmol_tpu.api import load_pretrained as _lp
    return _lp(model_name, model_dir=model_dir)
