"""Pallas TPU kernels and the dispatch gate.

``use_pallas_scans`` decides whether the fused scan kernels replace the
``lax.associative_scan`` paths: on by default on real TPU backends for f32
elements with small state dimension; controllable globally via
:func:`set_pallas_scans`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MODE = "auto"  # "auto" | "on" | "off"


def set_pallas_scans(mode: str) -> None:
    """Force the fused Pallas scan kernels on/off ("auto" restores default)."""
    global _MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"mode must be auto/on/off, got {mode!r}")
    _MODE = mode


def use_pallas_scans(dtype, n: int) -> bool:
    """Gate: fused kernels handle f32 elements with n <= 8 on TPU."""
    if _MODE == "off":
        return False
    eligible = dtype == jnp.float32 and n <= 8
    if _MODE == "on":
        return eligible
    return eligible and jax.default_backend() == "tpu"


def use_seq_newton(dtype, n: int, horizon: int | None = None,
                   nu: int | None = None) -> bool:
    """Gate for the fused sequential Newton-trial kernels (batch in lanes).

    Same eligibility as the scan kernels; selected by
    ``SolverConfig.newton_impl == "seq"`` (the batched-throughput path).
    There is no horizon cap: horizons whose stage data exceeds the resident
    kernel's VMEM budget dispatch to the T-streamed variant instead
    (seq_newton_kernel.py, ``_pick_kernel``).  ``horizon``/``nu`` are kept
    for signature compatibility.
    """
    del horizon, nu
    return use_pallas_scans(dtype, n)


def use_fused_newton(dtype, n: int) -> bool:
    """Gate for the single-launch fused Newton-trial kernel.

    Same eligibility as the scan kernels plus an env kill-switch
    (IPOC_FUSED_NEWTON=0) in case its larger compile time is unwanted.
    """
    import os

    if os.environ.get("IPOC_FUSED_NEWTON", "1") == "0":
        return False
    return use_pallas_scans(dtype, n)
