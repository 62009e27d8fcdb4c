"""Global runtime configuration.

The reference library configures itself with ~50 compile-time ``MFEM_USE_*``
macros (``config/defaults.mk:136-197``) plus a runtime ``Device::Configure``
string (``general/device.hpp:224``) and a precision switch selecting ``real_t``
(``config/defaults.mk:192-197``).  The TPU-native build replaces the entire
feature matrix with this single runtime config object:

* ``dtype`` — the global scalar type ("float64" / "float32" / "bfloat16"),
  the analog of MFEM's ``real_t``.  float64 on TPU is emulated (slow); tests
  run float64 on CPU for 1e-8 parity, benches may select float32 with
  float64 reductions (see ``linalg.solvers``).
* quadrature defaults and scatter determinism knobs.

No compile-time flags: everything under ``jax.jit`` re-specializes as needed.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_DTYPES = {
    "float64": jnp.float64,
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}


@dataclasses.dataclass
class Config:
    """Global knobs. Mutate via :func:`configure` (not mid-trace)."""

    #: Global scalar type name (MFEM ``real_t`` analog).
    dtype: str = os.environ.get("CAX_DTYPE", "float64")
    #: Extra 1D quadrature points beyond the p+1 minimum: nq1d = p + 1 + quad_extra.
    quad_extra: int = 1
    #: Accumulate iterative-solver inner products in float64 even when
    #: ``dtype`` is float32 (mixed-precision CG; SURVEY.md §7 risk item 1).
    f64_reductions: bool = True
    #: MXU contraction precision for the sum-factorized applies:
    #: "highest" = full f32 (6-pass), "high" = 3-pass bf16 (usually
    #: f32-equivalent), "default" = single-pass bf16 (fast, ~4e-3/product —
    #: unacceptable for the 1e-8-parity targets).
    matmul_precision: str = "highest"
    #: Unstructured L↔E restriction strategy: "auto" = Pallas block-gather on
    #: TPU, XLA gather/segment-sum elsewhere; "on"/"off" force it.  (See
    #: ops/block_gather.py — XLA scalar gathers are ~1500× off roofline on
    #: TPU.)
    fast_restriction: str = "auto"
    #: Lane-major transposed PA apply (ops/lanemajor.py): "auto" = on for
    #: scalar mass/diffusion/convection with nd ≤ 256 (elements ride the
    #: 128-lane axis — faster AND more accurate than the staged einsums);
    #: "off" forces the sum-factorized path.
    lane_major: str = "auto"
    #: Affine separable-qdata collapse (ops/lanemajor.py): "auto" = detect
    #: W⊗d-separable qdata (straight-sided elements, constant coefficients)
    #: and apply via precomputed reference matrices — nq-fold less qdata
    #: traffic; "off" keeps the per-qpt path (bit-identical to MFEM's PA
    #: rounding — the CG-parity harness pins this, the refactored affine
    #: sum order can legitimately shift iteration counts ±1 at 1e-12).
    affine_collapse: str = "auto"


config = Config()


def configure(**kw) -> Config:
    """Update global config fields; returns the config."""
    for k, v in kw.items():
        if not hasattr(config, k):
            raise ValueError(f"unknown config field {k!r}")
        setattr(config, k, v)
    return config


def enable_compilation_cache(path: Optional[str] = None,
                             min_compile_secs: float = 1.0) -> str:
    """Turn on JAX's persistent compilation cache.

    The reference rebuilds nothing at run time; our analog of its
    "compile once" property is XLA's on-disk executable cache — repeat
    runs of the same jitted step (bench re-runs, restarted production
    jobs, dress rehearsals) skip the multi-minute compile entirely.
    Cold compiles are unaffected.  Default location honours
    ``CAX_COMPILE_CACHE`` and falls back to ``~/.cache/cax_tpu_xla``.

    Returns the cache directory in use.
    """
    if path is None:
        path = os.environ.get(
            "CAX_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "cax_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    # cache every entry point, not just top-level jits
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except AttributeError:  # older jax
        pass
    return path


def real_t(dtype: Optional[object] = None):
    """Resolve the global scalar dtype (or pass through an explicit one).

    Falls back to float32 if float64 is requested without x64 enabled.
    """
    if dtype is not None:
        return jnp.dtype(dtype)
    dt = _DTYPES[config.dtype]
    if dt == jnp.float64 and not jax.config.jax_enable_x64:
        return jnp.dtype(jnp.float32)
    return jnp.dtype(dt)


def np_real_t(dtype: Optional[object] = None):
    """Numpy view of :func:`real_t` for host-side setup code."""
    dt = real_t(dtype)
    if dt == jnp.bfloat16:
        return np.dtype(np.float32)
    return np.dtype(dt)


def index_t():
    """Global integer index dtype for gather/scatter maps (int32: TPU-friendly)."""
    return jnp.dtype(jnp.int32)
